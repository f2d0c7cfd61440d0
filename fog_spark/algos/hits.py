"""HITS (hubs & authorities), integer-milli max-normalized twin.

Kleinberg (1999): alternating a(v) = sum of h over in-edges, h(v) = sum
of a over out-edges, renormalized each half-step. The reference engine
family stops at PageRank (/root/reference/TODO.list:16-21); HITS is the
classic companion link-analysis algorithm.

Float HITS normalizes by the L2 norm — not bit-reproducible across
engines. This twin normalizes by the MAX instead (equivalent fixpoint
direction up to scale) and keeps everything in integer millis:

    a_t(v)  = sum_{u->v} h'_{t-1}(u)
    a'_t(v) = (a_t(v) * 1000) div max_v a_t(v)        (0 if max = 0)
    h_t(v)  = sum_{v->w} a'_t(w)
    h'_t(v) = (h_t(v) * 1000) div max_v h_t(v)

`div` is INTEGER division on both engines (operands non-negative), so
per-vertex scores are exact BIGINTs a SQL oracle reproduces bit-for-bit
after the same bounded iteration count. Overflow headroom: scores are
<= 1000 after each normalization, so a raw sum is <= 1000 * max_degree
and the *1000 product <= 10^6 * max_degree — safe in a BIGINT to
max_degree ~ 9 * 10^12.

Scale shape per iteration: two SpMV-style explode + groupBy passes over
the grouped adjacency (map-side combinable sums), each followed by a
scalar max aggregation folded into the same materialization job via a
broadcast cross join — no extra blocking driver round-trips.
Multi-edges count with multiplicity (a parallel edge is a stronger
endorsement), matching the SpMV semantics elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import Materializer


def hits_milli(edges: DataFrame, iters: int = 4) -> DataFrame:
    """``(id, auth_milli, hub_milli)`` after ``iters`` alternating
    max-normalized integer iterations (bounded-iteration contract,
    mirrored by the SQL oracle)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    M = Materializer(edges.sparkSession)
    e = M.checkpoint(G.normalize_edges(edges).select("src", "dst"))
    verts = M.checkpoint(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = M.checkpoint(
        verts.select("id", F.lit(1000).cast("long").alias("hub_milli"))
    )

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        mx = scores.agg(F.max(col).alias("_mx"))
        return scores.crossJoin(F.broadcast(mx)).select(
            "id",
            F.when(
                F.col("_mx") > 0,
                F.expr(f"({col} * 1000) div _mx"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias(col),
        )

    auth = None
    for _ in range(iters):
        raw_a = (
            e.join(state.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub_milli").alias("auth_milli"))
        )
        a_full = verts.join(raw_a, "id", "left").select(
            "id", F.coalesce("auth_milli", F.lit(0)).cast("long").alias("auth_milli")
        )
        auth = M.swap(auth, _norm(a_full, "auth_milli")) if auth is not None else M.checkpoint(
            _norm(a_full, "auth_milli")
        )
        raw_h = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth_milli").alias("hub_milli"))
        )
        h_full = verts.join(raw_h, "id", "left").select(
            "id", F.coalesce("hub_milli", F.lit(0)).cast("long").alias("hub_milli")
        )
        state = M.swap(state, _norm(h_full, "hub_milli"))
    out = auth.join(state, "id").select("id", "auth_milli", "hub_milli")
    result = M.checkpoint(out)
    M.free(auth)
    M.free(state)
    M.free(verts)
    M.free(e)
    return result
