"""HTML -> (text, outlinks) extraction and edge-table construction.

Reference analog: the ``convert`` binary's edge-list parser
(/root/reference/convert/process_edgelist.cpp:55-221) — but our input is
Common-Crawl-style pages (north_rule), so "parsing" is outlink extraction
from HTML plus a url->vertex-id dictionary join.

Two implementations, pinned equal by tests:

- **native column expressions** (default): ``regexp_extract`` /
  ``regexp_extract_all`` run JVM-side inside whole-stage codegen — zero
  Python in the hot path. This is the 100 TB path.
- **Arrow pandas UDF** (:func:`extract_pages_udf`): vectorized pandas
  string ops over Arrow batches, demonstrating the input_hint's
  "vectorized pandas/Arrow UDFs, no per-row Python" contract for parsers
  too gnarly for regex.

The extracted ``text`` must be byte-identical to the pages table's
``text`` column per url (input_hint) — test_extract.py pins this.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fog_spark.hashing import pmod

# text sits between <body> and the first anchor (or </body> if no anchors)
_TEXT_RE = r"<body>(.*?)(?:<a href=|</body>)"
_HREF_RE = r'<a href="([^"]+)"'


def _as_str(html: Column) -> Column:
    return F.decode(html, "UTF-8")


def extract_text_col(html: Column) -> Column:
    """Body text of an html:binary column — native, codegen'd."""
    return F.regexp_extract(_as_str(html), _TEXT_RE, 1)


def extract_outlinks_col(html: Column) -> Column:
    """array<string> of href targets — native, codegen'd."""
    return F.regexp_extract_all(_as_str(html), F.lit(_HREF_RE), F.lit(1))


def extract_pages_udf(pages: DataFrame) -> DataFrame:
    """Arrow-batched extraction: (url, text, outlinks) via mapInPandas.

    Vectorized pandas ``.str`` ops on each Arrow batch; no per-row Python
    loops outside pandas' own C string kernels.
    """
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("outlinks", T.ArrayType(T.StringType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            html = pdf["html"].map(lambda b: bytes(b).decode("utf-8"))
            text = html.str.extract(_TEXT_RE, expand=False).fillna("")
            links = html.str.findall(_HREF_RE)
            yield pd.DataFrame({"url": pdf["url"], "text": text, "outlinks": links})

    return pages.select("url", "html").mapInPandas(batches, schema)


def fixture_page_ids(pages: DataFrame) -> DataFrame:
    """(url, id) for FIXTURES.md F1 urls: id = trailing /p/<k>."""
    return pages.select(
        F.col("url"), F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("id")
    )


def assign_dense_ids(
    urls: DataFrame,
    col: str = "url",
    partitions: int | None = None,
    materializer=None,
) -> DataFrame:
    """Dense 0..n-1 vertex ids for arbitrary url sets, scalably.

    The analog of FOG's dense u32 vid space (/root/reference/convert/
    convert.cpp:30-34). No global window: range-partition by url, rank
    locally, then add per-partition offsets (a driver-side prefix sum over
    P counts — P rows, not data).

    ``materializer``: when given, the returned dictionary is eagerly
    checkpointed through it (reclaimable via its ``free``) and the
    internal distinct-key cache is dropped immediately; when omitted the
    lazy result keeps that cache alive until the session ends — fine for
    one-shot runs, a per-call leak for repeated library calls (same
    contract as host_graph's).
    """
    spark = urls.sparkSession
    if partitions is None:
        partitions = urls.rdd.getNumPartitions()
    d = (
        urls.select(col).distinct()
        .repartitionByRange(partitions, col)
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.persist()
    counts = {r["_pid"]: r["c"] for r in d.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "pid int, _offset long"
    )
    from pyspark.sql import Window as W

    local_rank = F.row_number().over(W.partitionBy("_pid").orderBy(col)) - 1
    out = (
        d.withColumn("_rank", local_rank)
        .join(F.broadcast(off_df), F.col("_pid") == F.col("pid"))
        .select(F.col(col), (F.col("_offset") + F.col("_rank")).alias("id"))
    )
    if materializer is not None:
        out = materializer.checkpoint(out)
        d.unpersist()
    return out


def edges_from_pages(
    pages: DataFrame,
    ids: DataFrame | None = None,
    use_udf: bool = False,
    weighted: bool = True,
    resolve: bool = False,
) -> DataFrame:
    """pages -> (src, dst, weight) edge table.

    ids: optional (url, id) dictionary; defaults to the fixture url parse.
    resolve: route extraction through functions/urlnorm.page_links —
    relative hrefs resolved against the page url, canonicalized
    (lowercased host, default ports stripped, dot-segments removed),
    rel="nofollow" links dropped. Off by default: the fixture pages carry
    absolute canonical hrefs, and the raw path joins the dictionary on
    the exact href bytes.
    Weight is deterministic: 1.0 + pmod(xxhash64(src, dst), 9000)/1000
    (FIXTURES F2) — the reproducible replacement for FOG's time-seeded
    random type1 weights (/root/reference/convert/process_adjlist.cpp:25-30).
    """
    if ids is None:
        ids = fixture_page_ids(pages)
    if resolve:
        from fog_spark.functions.urlnorm import page_links

        linked = page_links(pages, follow_only=True).select("url", "dst_url")
    elif use_udf:
        linked = extract_pages_udf(pages).select("url", F.explode("outlinks").alias("dst_url"))
    else:
        linked = pages.select(
            "url", F.explode(extract_outlinks_col(F.col("html"))).alias("dst_url")
        )
    src_ids = ids.withColumnRenamed("id", "src")
    dst_ids = ids.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    e = (
        linked.join(src_ids, "url")
        .join(dst_ids, "dst_url")
        .select("src", "dst")
    )
    if not weighted:
        return e
    w = 1.0 + pmod(F.xxhash64(F.col("src").cast("long"), F.col("dst").cast("long")), F.lit(9000)) / 1000.0
    return e.select("src", "dst", w.alias("weight"))
