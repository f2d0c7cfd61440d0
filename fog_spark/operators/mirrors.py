"""Mirror-host detection — hosts serving replicated content.

Bharat & Broder, "Mirror, mirror on the Web" (WWW 1999): host pairs
whose document sets overlap heavily are mirrors (or boilerplate farms);
a crawler wants to fetch one of them and a dedup pipeline wants to know
the overlap before URL-level near-dup work. Not in the reference (its
roadmap stops at graph algorithms, /root/reference/TODO.list:16-21);
standard published semantics.

Shape: the (host, content-fingerprint) bipartite relation co-projected
onto host pairs — the same capped-self-join discipline as
``operators.projection.co_project`` and the shingle-df cap in
``operators.dedup.ngram_jaccard_pairs``:

- fingerprint = md5(text) (exact replication; swap in a SimHash column
  for near-replication, the pairing plan is unchanged),
- fingerprints present on more than ``max_fp_hosts`` hosts are EXCLUDED
  before pairing (an empty page or a shared boilerplate body appears on
  thousands of hosts and carries no mirroring signal — and would cost
  cap^2 pairs per fingerprint otherwise),
- host pairs sharing >= ``min_shared`` kept fingerprints come out with
  ``overlap = shared / min(|A|, |B|)`` — 1.0 means the smaller host is
  fully contained in the larger (the mirror shape).

Cost after the cap is <= max_fp_hosts^2 rows per fingerprint before the
pair aggregation; everything else is hash aggs with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.operators.hostgraph import host_of


def host_fingerprints(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(host, fp) distinct — one row per (host, exact content) pair."""
    return (
        pages.select(
            host_of(F.col(url_col)).alias("host"),
            F.md5(F.col(text_col).cast("binary")).alias("fp"),
        )
        # host_of returns '' (not null) for relative/malformed URLs —
        # exclude those too, or every such page collapses into a fake
        # '' host that pairs against real hosts
        .where(
            F.col("host").isNotNull()
            & (F.col("host") != "")
            & F.col("fp").isNotNull()
        )
        .distinct()
    )


def mirror_hosts(
    pages: DataFrame,
    min_shared: int = 2,
    max_fp_hosts: int = 50,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """``(host_a, host_b, shared, size_a, size_b, overlap_permille)`` —
    host pairs (host_a < host_b) sharing >= ``min_shared`` exact page
    bodies, ignoring bodies served by more than ``max_fp_hosts`` hosts.
    overlap_permille = 1000 * shared / min(size_a, size_b), where sizes
    count each host's KEPT distinct fingerprints (integer milli so the
    score is engine-portable)."""
    if max_fp_hosts < 2:
        raise ValueError("max_fp_hosts must be >= 2")
    hf = host_fingerprints(pages, url_col, text_col)
    kept_fp = (
        hf.groupBy("fp")
        .agg(F.count("*").alias("_h"))
        .where(F.col("_h") <= max_fp_hosts)
        .select("fp")
    )
    kept = hf.join(kept_fp, "fp", "left_semi")
    sizes = kept.groupBy("host").agg(F.count("*").alias("sz"))
    l = kept.select("fp", F.col("host").alias("host_a"))
    r = kept.select("fp", F.col("host").alias("host_b"))
    pairs = (
        l.join(r, "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("size_b")),
            "host_b",
        )
        .select(
            "host_a", "host_b", "shared", "size_a", "size_b",
            (F.col("shared") * 1000 / F.least("size_a", "size_b"))
            .cast("long")
            .alias("overlap_permille"),
        )
    )
