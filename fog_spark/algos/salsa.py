"""SALSA (Stochastic Approach for Link-Structure Analysis),
integer-milli max-normalized twin.

Lempel & Moran (2000): like HITS, but each half-step is a *random-walk*
(degree-normalized) transition instead of a raw sum — an authority
receives h(u)/outdeg(u) from each in-neighbor u, a hub receives
a(v)/indeg(v) from each out-neighbor v. This damps the
tightly-knit-community effect that makes HITS lock onto one dense
cluster, which is exactly the failure mode of web link spam. The
reference engine family stops at PageRank
(/root/reference/TODO.list:16-21); SALSA is the standard link-analysis
companion the web-graph literature pairs with HITS and PageRank.

Float SALSA is not bit-reproducible across engines, so this twin keeps
everything in integer millis with INTEGER division at both the per-edge
normalization and the max-normalization (operands non-negative, so
Spark's `div` and DuckDB's `//` agree bit-for-bit):

    a_t(v)  = sum_{(u,v) in E} ( h'_{t-1}(u) div outdeg(u) )
    a'_t(v) = (a_t(v) * 1000) div max_v a_t(v)        (0 if max = 0)
    h_t(u)  = sum_{(u,v) in E} ( a'_t(v) div indeg(v) )
    h'_t(u) = (h_t(u) * 1000) div max_u h_t(u)

Degrees count multi-edges with multiplicity (a parallel edge is a
stronger endorsement), matching the SpMV/HITS semantics elsewhere.
Overflow headroom: after each max-normalization scores are <= 1000, a
per-edge quotient is <= 1000, so a raw sum is <= 1000 * max_degree and
the *1000 product <= 10^6 * max_degree — safe in a BIGINT to
max_degree ~ 9 * 10^12.

Scale shape per iteration: two SpMV-style join + groupBy passes over a
once-materialized degree-enriched edge table (map-side combinable
sums), each followed by a scalar max folded in via a broadcast cross
join — no extra blocking driver round-trips, no per-iteration degree
recomputation. The enriched edge table adds two BIGINT columns over the
raw edge list; at 10^12-document scale that is one extra one-off
edge-sized materialization, after which every iteration touches the
same pinned layout PageRank/HITS use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import Materializer


def salsa_milli(edges: DataFrame, iters: int = 4) -> DataFrame:
    """``(id, salsa_auth_milli, salsa_hub_milli)`` after ``iters``
    alternating degree-normalized, max-normalized integer iterations
    (bounded-iteration contract, mirrored by the SQL oracle)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    M = Materializer(edges.sparkSession)
    e = G.normalize_edges(edges).select("src", "dst")
    od = e.groupBy("src").agg(F.count("*").alias("od"))
    ind = e.groupBy("dst").agg(F.count("*").alias("ind"))
    # degree-enriched edges, materialized once: every iteration's two
    # walk half-steps read this same table
    ee = M.checkpoint(e.join(od, "src").join(ind, "dst").select("src", "dst", "od", "ind"))
    verts = M.checkpoint(
        ee.select(F.col("src").alias("id"))
        .unionByName(ee.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = M.checkpoint(
        verts.select("id", F.lit(1000).cast("long").alias("hub_milli"))
    )

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        mx = scores.agg(F.max(col).alias("_mx"))
        return scores.crossJoin(F.broadcast(mx)).select(
            "id",
            F.when(F.col("_mx") > 0, F.expr(f"({col} * 1000) div _mx"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(col),
        )

    auth = None
    for _ in range(iters):
        raw_a = (
            ee.join(state.withColumnRenamed("id", "src"), "src")
            .select("dst", F.expr("hub_milli div od").alias("_c"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("_c").alias("auth_milli"))
        )
        a_full = verts.join(raw_a, "id", "left").select(
            "id", F.coalesce("auth_milli", F.lit(0)).cast("long").alias("auth_milli")
        )
        a_new = _norm(a_full, "auth_milli")
        auth = M.swap(auth, a_new) if auth is not None else M.checkpoint(a_new)
        raw_h = (
            ee.join(auth.withColumnRenamed("id", "dst"), "dst")
            .select("src", F.expr("auth_milli div ind").alias("_c"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("_c").alias("hub_milli"))
        )
        h_full = verts.join(raw_h, "id", "left").select(
            "id", F.coalesce("hub_milli", F.lit(0)).cast("long").alias("hub_milli")
        )
        state = M.swap(state, _norm(h_full, "hub_milli"))
    out = auth.join(state, "id").select(
        "id",
        F.col("auth_milli").alias("salsa_auth_milli"),
        F.col("hub_milli").alias("salsa_hub_milli"),
    )
    result = M.checkpoint(out)
    M.free(auth)
    M.free(state)
    M.free(verts)
    M.free(ee)
    return result
