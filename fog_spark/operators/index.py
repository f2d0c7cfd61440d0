"""Inverted index + BM25 retrieval over the document corpus.

The classic web-search backend the link-graph signals (PageRank,
anchor text) combine with: build a postings table (term, doc_id, tf),
document lengths, and per-term document frequencies, then score
documents for keyword queries with BM25 (Robertson-Sparck Jones;
k1/b defaults 1.2/0.75). The reference engine has no text layer at all
(its ingest starts at an edge list,
/root/reference/convert/process_edgelist.cpp:55-221); this is the
webtext extension of the corpus-pipeline surface.

Two scorers, same discipline as the PageRank milli twins:

- ``bm25_topk``: standard float BM25 with the log idf — the production
  path, pytest-pinned against a pure-Python replay.
- ``bm25_topk_micro``: a float-free rational twin — idf_milli =
  (1000*N) div df (monotone in df like the log idf; not the same
  curve, a documented scoring contract of its own) and the exact tf /
  length-normalization quotient carried in integer micro units — so
  every score replays bit-for-bit in the DuckDB oracle (all operands
  nonnegative, so Spark ``div`` and DuckDB ``//`` agree). tf is clamped
  at TF_CAP so one keyword-stuffed page can never overflow the BIGINT
  expression and abort the job; the idf side is BIGINT-safe to ~1e9
  docs — past that use the float path (the ranking, not the hash, is
  the product at that scale).

Scale shape: tokenize + explode + one (doc, term) hash agg builds
postings (map-side combinable); scoring FILTERS postings to the query
terms first (broadcast semi-join against a terms-sized frame), so df,
length join and the (query, doc) score agg all run on query-matched
rows only — a 100 TB corpus scores a 10-term query over the term's
postings, never the full index. Top-k is a window over query_id
(bounded partitions: one per query).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fog_spark.hashing import pmod

# ONE corpus token rule: operators/dedup.tokenize_col is the canonical
# Column implementation (text.py routes through it too; the gate
# oracle's TOKS replays it in DuckDB) — import, never re-implement
from fog_spark.operators.dedup import tokenize_col as _toks_col

_TOKEN_SPLIT = "[^a-z0-9]+"  # python-side mirror for tokenize_query

# tf clamp for the integer twin: keeps the score expression inside
# BIGINT under ANSI (raw tf >= ~4.19e6 — a keyword-stuffed ~25 MB spam
# page — would overflow `1000000 * tf * (k1+1e6)` and abort the whole
# job). The tf component is within one div-rounding of its k1+1
# asymptote long before 1e6, so clamping changes no sane ranking;
# mirrored in the DuckDB oracle and the pytest replay.
TF_CAP = 1_000_000


def tokenize_query(q: str) -> list[str]:
    """Distinct query terms under the corpus token rule (duplicate query
    terms carry no extra weight — documented contract)."""
    return sorted({t for t in re.split(_TOKEN_SPLIT, q.lower()) if t})


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) — one explode + one hash agg."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_toks_col(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl) token counts — zero-length docs kept (they belong in
    N and avgdl)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(_toks_col(F.col(text_col))).cast("long").alias("dl"),
    )


def _query_frames(spark, queries):
    """(qdf, terms): the (query_id, term) table and its distinct-term
    projection — shared by every scorer so tokenization and the
    broadcast-semi-join shape can never diverge between them."""
    q_rows = [
        (qid, t) for qid, q in enumerate(queries) for t in tokenize_query(q)
    ]
    qdf = spark.createDataFrame(q_rows, "query_id long, term string")
    return qdf, qdf.select("term").distinct()


def _scored_postings(docs, queries, text_col, id_col, postings=None, lengths=None):
    """Common front half: postings filtered to query terms, joined with
    df, dl and the query term table. Returns (frame, n_docs, avgdl_milli).

    ``postings``/``lengths`` accept a PREBUILT index (build_postings /
    doc_lengths persisted as parquet) — the production shape: the ad-hoc
    path re-tokenizes the corpus for postings, lengths and the length
    stats (~3 scans), which is fine for one-shot scoring but not for a
    query service over 100 TB; build once, query many."""
    spark = docs.sparkSession
    qdf, terms = _query_frames(spark, queries)
    p = postings if postings is not None else build_postings(docs, text_col, id_col)
    dl = lengths if lengths is not None else doc_lengths(docs, text_col, id_col)
    stats = dl.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tot")
    ).collect()[0]
    n_docs, total = int(stats["n"]), int(stats["tot"])
    # floor 1 so the all-empty-corpus edge never divides by zero
    avgdl_milli = max(1, (1000 * total) // n_docs) if n_docs else 1000
    # df over query terms only: one broadcast semi-join, then a term agg
    # on the filtered (already per-(term,doc)-unique) postings
    fp = p.join(F.broadcast(terms), "term", "left_semi")
    dft = fp.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        fp.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
    )
    return scored, n_docs, avgdl_milli


_TOPK_SALTS = 64


def _topk(per_doc: DataFrame, score: Column, k: int) -> DataFrame:
    """Exact top-k per query_id without a single-task global sort: a
    window over query_id alone would sort EVERY matching doc of a broad
    query in one task (the window-over-skewable-key trap). Phase 1 ranks
    within (query_id, hash-salt of doc_id) partitions and keeps k per
    salt — the global top-k is a subset of the per-salt top-k's union —
    so phase 2's window sees at most k*_TOPK_SALTS rows per query.
    Deterministic: the salt is a pure hash of doc_id and the final
    ordering (score desc, doc_id) is a total order."""
    order = [score.desc(), F.col("doc_id")]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    cand = (
        per_doc.withColumn("_salt", pmod(F.xxhash64("doc_id"), _TOPK_SALTS))
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return cand.withColumn("rank", F.row_number().over(w2).cast("long")).where(
        F.col("rank") <= k
    )


def bm25_topk_micro(
    docs: DataFrame,
    queries: list[str],
    k: int = 10,
    k1_micro: int = 1_200_000,
    b_micro: int = 750_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score_micro) — integer-exact BM25 twin.

    Per matched term: idf_milli = (1000*N) div df;
    tf component = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) carried in
    micro via truncating div at each stage (see module doc); term score
    = (idf_milli * tf_comp_micro) div 1000. Rank orders by score desc
    then doc_id — integer scores make the order engine-independent.
    Pass a persisted ``postings``/``lengths`` pair to skip re-tokenizing
    the corpus (see _scored_postings).
    """
    scored, n_docs, avgdl_milli = _scored_postings(
        docs, queries, text_col, id_col, postings, lengths
    )
    expr = f"""
      (( {1000 * n_docs} div df ) *
       ( (1000000 * (_tfc * ({k1_micro} + 1000000))) div
         (1000000 * _tfc +
          ({k1_micro} * (1000000 - {b_micro} +
            ({b_micro} * ((1000000000 * dl) div {avgdl_milli})) div 1000000)
          ) div 1000000)
       )) div 1000"""
    per_doc = (
        scored.withColumn("_tfc", F.least(F.col("tf"), F.lit(TF_CAP)))
        .withColumn("_s", F.expr(expr))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score_micro"))
    )
    return _topk(per_doc, F.col("score_micro"), k).select(
        "query_id", "rank", "doc_id", "score_micro"
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — standard float BM25
    (idf = ln((N - df + 0.5)/(df + 0.5) + 1), the Lucene form)."""
    scored, n_docs, avgdl_milli = _scored_postings(
        docs, queries, text_col, id_col, postings, lengths
    )
    avgdl = avgdl_milli / 1000.0
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_comp = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    per_doc = (
        scored.withColumn("_s", idf * tf_comp)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score"))
    )
    return _topk(per_doc, F.col("score"), k).select(
        "query_id", "rank", "doc_id", "score"
    )


# ------------------------------------------------------------- BM25F

# weighted-tf clamp (milli units): keeps the BM25F expression inside
# BIGINT under ANSI the same way TF_CAP does for plain BM25. 1000x
# TF_CAP so a single field at weight 1000 clamps at EXACTLY the same
# effective tf as the plain scorer — the identity contract covers the
# whole tf range, clamp included.
TFW_CAP_MILLI = 1000 * TF_CAP


def anchor_field(
    links: DataFrame, follow_only: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, tf) postings + (doc_id, dl) lengths for the ANCHOR-TEXT
    field of each linked-to URL, from a page_links-shaped frame
    (url, dst_url, anchor[, nofollow]) — the classic relevance signal:
    text OTHER pages use to describe a target ranks the target. Returns
    (postings, lengths) keyed by doc_id = dst_url (string); feed into
    bm25f_topk_micro alongside a body field keyed the same way. One
    explode + two hash aggs, hub-safe (a popular URL's anchors spread
    across partitions until the final per-doc agg, which is
    map-side-combinable)."""
    a = links
    if follow_only and "nofollow" in a.columns:
        a = a.where(~F.col("nofollow"))
    toks = a.where(F.trim(F.col("anchor")) != "").select(
        F.col("dst_url").alias("doc_id"),
        F.explode(_toks_col(F.col("anchor"))).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    lengths = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    return postings, lengths


def bm25f_topk_micro(
    fields: list[tuple[DataFrame, DataFrame]],
    weights_milli: list[int],
    queries: list[str],
    k: int = 10,
    k1_micro: int = 1_200_000,
    b_micro: int = 750_000,
) -> DataFrame:
    """(query_id, rank, doc_id, score_micro) — integer-exact BM25F
    (Robertson-Zaragoza field-weighted BM25): per term and doc the
    field tfs combine FIRST (T_milli = sum_f w_f_milli * tf_f, one
    saturation over the combined value — not a score-level fusion),
    document length likewise (DL_milli = sum_f w_f_milli * dl_f), then
    the plain-BM25 integer pipeline runs on the milli-valued tf:

      component_micro = (1000 * T * (k1+1e6)) div (1000*T + K_micro)

    (the naive form (1e6*T*A) div (1e3*(1e3*T+K)) shares the exact
    factor 1000 between numerator and denominator, and (a*c) div (b*c)
    == a div b for positive ints, so the reduced form above is equal
    AND keeps T up to TFW_CAP_MILLI inside BIGINT). For a single field
    at weight 1000 this is IDENTICALLY plain bm25_topk_micro over the
    ENTIRE tf range — T = 1000*tf clamps at TFW_CAP_MILLI exactly when
    tf clamps at TF_CAP (pinned by test, including a beyond-1000 tf).
    idf uses the combined df (docs holding the term in ANY field).
    ``fields`` is a list of (postings, lengths) with a shared doc_id
    type (long ids or url strings); a doc missing from a field's frames
    contributes 0 for that field.
    """
    if len(fields) != len(weights_milli) or not fields:
        raise ValueError("fields and weights_milli must align and be non-empty")
    spark = fields[0][0].sparkSession
    qdf, terms = _query_frames(spark, queries)
    # combined weighted postings over query terms only
    wp = None
    wl = None
    for (p, l), w in zip(fields, weights_milli):
        # per-field clamp BEFORE weighting: tf*w itself must stay inside
        # BIGINT whatever the input claims; the combined T clamps again
        fp = p.join(F.broadcast(terms), "term", "left_semi").select(
            "term",
            "doc_id",
            (F.least(F.col("tf"), F.lit(TF_CAP)) * F.lit(int(w))).alias("_tfw"),
        )
        fl = l.select("doc_id", (F.col("dl") * F.lit(int(w))).alias("_dlw"))
        wp = fp if wp is None else wp.unionByName(fp)
        wl = fl if wl is None else wl.unionByName(fl)
    T = (
        wp.groupBy("term", "doc_id")
        .agg(F.sum("_tfw").alias("_t_raw"))
        .withColumn("_t", F.least(F.col("_t_raw"), F.lit(TFW_CAP_MILLI)))
        .drop("_t_raw")
    )
    DL = wl.groupBy("doc_id").agg(F.sum("_dlw").alias("_dl"))
    stats = DL.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("_dl"), F.lit(0)).alias("tot")
    ).collect()[0]
    n_docs, total = int(stats["n"]), int(stats["tot"])
    avgdl_milli = max(1, total // n_docs) if n_docs else 1
    dft = T.groupBy("term").agg(F.count("*").alias("df"))
    # left-join DL: a doc_id present in some field's postings but absent
    # from every field's lengths frame scores with _dl = 0 (the docstring
    # contract "a doc missing from a field's frames contributes 0"),
    # instead of being silently dropped by an inner join
    scored = (
        T.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dft), "term")
        .join(DL, "doc_id", "left")
        .withColumn("_dl", F.coalesce(F.col("_dl"), F.lit(0).cast("long")))
    )
    expr = f"""
      (( {1000 * n_docs} div df ) *
       ( (1000 * (_t * ({k1_micro} + 1000000))) div
         (1000 * _t +
          ({k1_micro} * (1000000 - {b_micro} +
            ({b_micro} * ((1000000 * _dl) div {avgdl_milli})) div 1000000)
          ) div 1000000)
       )) div 1000"""
    per_doc = (
        scored.withColumn("_s", F.expr(expr))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score_micro"))
    )
    return _topk(per_doc, F.col("score_micro"), k).select(
        "query_id", "rank", "doc_id", "score_micro"
    )
