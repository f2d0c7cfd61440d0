"""Bipartite co-projection with a hub cap (co-citation / co-linking).

The classic "related pages" primitive over a link table: project the
src -> dst bipartite relation onto src-side pairs that share a dst,
weighted by how many dsts they share (co-citation; Small 1973). The
naive self-join explodes quadratically at hub dsts — one dst shared by
10^6 srcs yields 10^12 pairs — so, exactly like the shingle-frequency
cap in ``operators.dedup.ngram_jaccard_pairs``, dsts with more than
``max_dst_degree`` distinct srcs are EXCLUDED from pairing. The cap is
part of the query contract (mirrored in the SQL oracle) and is also
what you want statistically: a dst linked by everyone carries no
co-relevance signal (same reason IDF discounts stop-words).

Per-partition cost after the cap is bounded by cap^2 per dst; the
degree filter is one map-side-combinable groupBy ahead of the
self-join. Canonical output orientation a < b, one row per pair.

Not in the reference (graph-algorithm roadmap only,
/root/reference/TODO.list:16-21); standard published semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.graph import normalize_edges


def co_project(
    edges: DataFrame,
    max_dst_degree: int = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """``(a, b, shared)`` — distinct src pairs (a < b) sharing >=
    ``min_shared`` dsts, counting only dsts with <= ``max_dst_degree``
    distinct srcs."""
    if max_dst_degree < 2:
        raise ValueError("max_dst_degree must be >= 2")
    e = normalize_edges(edges).select("src", "dst").distinct()
    kept = (
        e.groupBy("dst")
        .agg(F.count("*").alias("_d"))
        .where(F.col("_d") <= max_dst_degree)
        .select("dst")
    )
    ek = e.join(kept, "dst", "left_semi")
    l = ek.select(F.col("dst"), F.col("src").alias("a"))
    r = ek.select(F.col("dst"), F.col("src").alias("b"))
    return (
        l.join(r, "dst")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
