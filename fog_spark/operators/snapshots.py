"""Multi-capture (snapshot) handling for Common-Crawl-style pages.

A real crawl table carries the SAME url many times — one row per capture
(``warc_ts``). Every batch analysis upstream of this module assumes one
row per url, so the first production step is snapshot collapse; and the
capture history itself is the input to recrawl scheduling (Cho &
Garcia-Molina, "Synchronizing a database to improve freshness", 2000:
refresh frequency should track observed change frequency).

Scale shape: both operators are ONE hash aggregation keyed by url with
map-side partial aggregation — ``max_by`` keeps a single struct per
group (no window, no sort), and the change stats are count/min/max plus
one exact distinct (two-level agg). No joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAYLOAD = ("warc_ts", "html", "text", "lang")


def latest_snapshots(pages: DataFrame) -> DataFrame:
    """One row per url: the latest capture by ``warc_ts``; exact-tie
    captures (same url, same timestamp) break deterministically by the
    larger xxhash64 of the html bytes (or of text when the table has no
    html column), so the result is a pure function of the table
    contents under any partitioning."""
    cols = [c for c in _PAYLOAD if c in pages.columns]
    tie = [F.col("warc_ts")]
    if "html" in pages.columns:
        tie.append(F.xxhash64(F.col("html")))
    elif "text" in pages.columns:
        tie.append(F.xxhash64(F.col("text")))
    picked = pages.groupBy("url").agg(
        F.max_by(F.struct(*cols), F.struct(*tie)).alias("_s")
    )
    return picked.select("url", *[F.col(f"_s.{c}").alias(c) for c in cols])


def page_change_stats(pages: DataFrame) -> DataFrame:
    """Per-url capture history summary for recrawl scheduling:
    ``(url, n_captures, n_versions, first_ts, last_ts, change_ratio)``
    where ``n_versions`` counts distinct text contents (md5) and
    ``change_ratio = (n_versions - 1) / greatest(n_captures - 1, 1)`` —
    0.0 for a page that never changed across captures, 1.0 for one that
    changed every time. Single-capture urls get ratio 0.0."""
    # NULL text (failed extraction) counts as its own version: coalesce
    # before hashing, or count_distinct drops the rows and the ratio
    # can go negative on all-NULL histories
    vh = F.md5(F.coalesce(F.col("text"), F.lit("\0null\0")).cast("binary"))
    return pages.groupBy("url").agg(
        F.count("*").alias("n_captures"),
        F.count_distinct(vh).alias("n_versions"),
        F.min("warc_ts").alias("first_ts"),
        F.max("warc_ts").alias("last_ts"),
        (
            (F.count_distinct(vh) - 1) / F.greatest(F.count("*") - 1, F.lit(1))
        ).alias("change_ratio"),
    )
