"""Newman modularity of a vertex labeling, integer-exact.

Q = sum_c [ e_c / m  -  (d_c / 2m)^2 ]  over communities c, with m =
|edges| of the canonical undirected simple graph, e_c = edges inside c,
d_c = total degree of c. The float form depends on summation order;
this twin reports the exact integer

    q_plus1_milli = ((Q_num + 4 m^2) * 1000) div (4 m^2),
    Q_num         = sum_c (4 m e_c - d_c^2)

i.e. floor(1000 * (Q + 1)) — the +1 offset keeps the dividend
non-negative so truncating `div` (Spark) and flooring `//` (DuckDB)
agree. Q's range [-1/2, 1) maps to [500, 2000). Overflow headroom:
|Q_num| <= 4 m^2, and the *1000 product needs 4000 m^2 < 2^63 — fine to
m ~ 1.5 * 10^9 edges; beyond that consume ``modularity_terms`` (the
unscaled integer numerator pieces) instead of the milli scalar.

The usual consumer is LPA: score the labeling it produced (gate query
`lpa5_modularity_milli`). One pass: edge->label join (two broadcastable
hash joins at gate scale, shuffle joins at 100 TB), one degree agg, one
per-label agg, one global sum — all map-side combinable.

Not in the reference (graph-algorithm roadmap only,
/root/reference/TODO.list:16-21); standard published definition
(Newman & Girvan 2004).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.algos.triangles import _canonical_undirected


def modularity_terms(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """``(label, e_c, d_c)`` per community over the canonical undirected
    simple graph — the exact integer ingredients of modularity.
    ``labels`` is ``(id, label)``; vertices with no simple-graph edge
    contribute nothing (d_c counts canonical-graph degree only)."""
    und = _canonical_undirected(edges)
    lab = labels.select("id", "label")
    degs = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("_d"))
    )
    ec = (
        und.join(lab.select(F.col("id").alias("a"), F.col("label").alias("_la")), "a")
        .join(lab.select(F.col("id").alias("b"), F.col("label").alias("_lb")), "b")
        .where(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count("*").alias("e_c"))
    )
    dc = (
        lab.join(degs, "id")
        .groupBy("label")
        .agg(F.sum("_d").alias("d_c"))
    )
    return dc.join(ec, "label", "left").select(
        "label",
        F.coalesce("e_c", F.lit(0)).cast("long").alias("e_c"),
        F.col("d_c").cast("long").alias("d_c"),
    )


def modularity_plus1_milli(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row ``(q_plus1_milli, m_edges)`` — floor(1000 * (Q + 1)) and
    the canonical edge count, both exact BIGINTs."""
    und = _canonical_undirected(edges)
    # m = 0 guard: a graph whose simple undirected projection is empty
    # (self-loops only, or no edges) has no defined modularity — return
    # an empty frame instead of an ANSI division-by-zero error. The
    # filter keeps the plan lazy (no driver-side count job).
    mm = und.agg(F.count("*").alias("_m")).where(F.col("_m") > 0)
    terms = modularity_terms(edges, labels)
    # Q_num needs m inside the per-label term; bring it in via broadcast
    per_label = terms.crossJoin(F.broadcast(mm)).select(
        (F.lit(4) * F.col("_m") * F.col("e_c") - F.col("d_c") * F.col("d_c")).alias(
            "_t"
        ),
        "_m",
    )
    return per_label.groupBy("_m").agg(F.sum("_t").alias("_qnum")).select(
        F.expr("CAST(((_qnum + 4 * _m * _m) * 1000) div (4 * _m * _m) AS BIGINT)").alias(
            "q_plus1_milli"
        ),
        F.col("_m").cast("long").alias("m_edges"),
    )
