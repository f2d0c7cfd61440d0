"""Deterministic Common-Crawl-style pages + link-graph generators.

Input contract (BASELINE.json input_hint): pages table with columns
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
FIXTURES.md F1/F2 pin the generation rules; everything is hash-derived
via Spark's xxhash64 (seed 42) so the distributed generator and the pure
Python oracle (:func:`pages_rows` / :func:`edges_rows`) agree exactly.

This replaces the reference's converter inputs (SNAP text edge lists,
/root/reference/convert/process_edgelist.cpp:55-221) with the web-scale
shape the north_rule demands. The generator is pure Column expressions
(whole-stage codegen, zero Python in the hot path) over ``spark.range``,
so it scales linearly with cores and partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fog_spark.hashing import pmod, xxhash64

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
LANGS = ["en", "de", "fr", "zh"]
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey", "xray",
    "yankee", "zulu", "amber", "birch", "cedar", "dune", "ember", "fjord",
    "grove", "harbor", "isle", "jade", "krill", "lagoon", "meadow", "nectar",
    "onyx", "pearl", "quartz", "reef", "summit", "thicket", "umber", "vale",
    "willow", "zenith", "arc", "bloom", "crest", "drift", "glen", "haze",
    "iris", "knoll", "loch", "mist", "nook", "opal", "pike", "ridge",
]


def n_sites_for(n_docs: int) -> int:
    return max(4, n_docs // 100)


def _url_expr(k, n_docs: int):
    s = pmod(k, F.lit(n_sites_for(n_docs)))
    return F.concat(F.lit("https://site"), s.cast("string"), F.lit(".example/p/"), k.cast("string"))


def _dsts_expr(k, n_docs: int):
    """Outlink targets of vertex k: (k*7 + i*13 + 1) % n for i < deg(k),
    deg(k) = pmod(xxhash64(k), 8). Self-loops are kept (FIXTURES F2)."""
    deg = pmod(F.xxhash64(k.cast("long")), F.lit(8))
    return F.when(deg > 0, F.transform(
        F.sequence(F.lit(0), deg - 1),
        lambda i: pmod(k * 7 + i.cast("long") * 13 + 1, F.lit(n_docs)),
    )).otherwise(F.array().cast("array<bigint>"))


def _text_expr(k, n_docs: int):
    s = pmod(k, F.lit(n_sites_for(n_docs)))
    n_words = pmod(F.xxhash64(k.cast("long"), F.lit(7).cast("long")), F.lit(12)) + 4
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: F.element_at(vocab, (pmod(F.xxhash64(k.cast("long"), (j + 1000).cast("long")), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    return F.concat(
        F.lit("doc "), k.cast("string"), F.lit(" site "), s.cast("string"), F.lit(" "),
        F.array_join(words, " "),
    )


def generate_pages(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Pages table ``(url, warc_ts, html:binary, text, lang)``; deterministic."""
    if partitions is None:
        partitions = max(4, min(1024, n_docs // 25_000 + 4))
    k = F.col("id")
    dsts = _dsts_expr(k, n_docs)
    text = _text_expr(k, n_docs)
    anchors = F.array_join(
        F.transform(dsts, lambda d: F.concat(F.lit('<a href="'), _url_expr(d, n_docs), F.lit('">t</a>'))),
        "",
    )
    html = F.concat(
        F.lit("<html><head><title>doc "), k.cast("string"), F.lit("</title></head><body>"),
        text, anchors, F.lit("</body></html>"),
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (pmod(F.xxhash64(k.cast("long")), F.lit(4)) + 1).cast("int"),
    )
    return (
        spark.range(0, n_docs, 1, partitions)
        .select(
            _url_expr(k, n_docs).alias("url"),
            F.timestamp_seconds(F.lit(EPOCH_2024) + k).alias("warc_ts"),
            F.encode(html, "UTF-8").alias("html"),
            text.alias("text"),
            lang.alias("lang"),
        )
    )


def generate_edges(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Edge table ``(src, dst, weight)`` straight from the F2 rule (bypasses
    HTML). ``extract.edges_from_pages(generate_pages(...))`` must equal this —
    pinned by tests. Weight is the deterministic analog of FOG's random
    type1 weights (/root/reference/README.txt:35): 1.0 + pmod(xxhash64(src,dst), 9000)/1000."""
    if partitions is None:
        partitions = max(4, min(1024, n_docs // 25_000 + 4))
    k = F.col("id")
    df = (
        spark.range(0, n_docs, 1, partitions)
        .select(k.alias("src"), F.explode(_dsts_expr(k, n_docs)).alias("dst"))
    )
    w = 1.0 + pmod(F.xxhash64(F.col("src").cast("long"), F.col("dst").cast("long")), F.lit(9000)) / 1000.0
    return df.select("src", "dst", w.alias("weight"))


# ------------------------------------------------------- pure-Python oracle

def _py_deg(k: int) -> int:
    return pmod(xxhash64(k), 8)


def _py_dsts(k: int, n_docs: int) -> list[int]:
    return [pmod(k * 7 + i * 13 + 1, n_docs) for i in range(_py_deg(k))]


def _py_text(k: int, n_docs: int) -> str:
    s = k % n_sites_for(n_docs)
    n_words = pmod(xxhash64(k, 7), 12) + 4
    words = [VOCAB[pmod(xxhash64(k, 1000 + j), len(VOCAB))] for j in range(n_words)]
    return f"doc {k} site {s} " + " ".join(words)


def _py_url(k: int, n_docs: int) -> str:
    return f"https://site{k % n_sites_for(n_docs)}.example/p/{k}"


def pages_rows(n_docs: int) -> list[dict]:
    """Python oracle for :func:`generate_pages` (small n only)."""
    rows = []
    for k in range(n_docs):
        text = _py_text(k, n_docs)
        anchors = "".join(f'<a href="{_py_url(d, n_docs)}">t</a>' for d in _py_dsts(k, n_docs))
        html = (
            f"<html><head><title>doc {k}</title></head><body>{text}{anchors}</body></html>"
        )
        rows.append(
            {
                "url": _py_url(k, n_docs),
                "k": k,
                "html": html.encode("utf-8"),
                "text": text,
                "lang": LANGS[pmod(xxhash64(k), 4)],
            }
        )
    return rows


def edges_rows(n_docs: int) -> list[tuple[int, int, float]]:
    """Python oracle for :func:`generate_edges`."""
    out = []
    for k in range(n_docs):
        for d in _py_dsts(k, n_docs):
            out.append((k, d, 1.0 + pmod(xxhash64(k, d), 9000) / 1000.0))
    return out
