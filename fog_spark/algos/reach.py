"""Anchor reachability: bitmask multi-source reachability propagation.

The neighborhood-function / effective-diameter estimators that work at
10^12 edges (ANF, Palmer et al. KDD 2002; HyperBall, Boldi & Vigna
2013) all have the same inner loop: every vertex keeps a small sketch
of "who reaches me", and one round ORs each vertex's sketch into its
out-neighbors'. Here the sketch is an EXACT 64-bit mask over up to 63
deterministically sampled anchor vertices — at web scale you estimate
the neighborhood function from the anchor sample; at oracle scale every
bit is reproducible, so the driver hash-checks the full fixpoint
(unlike HyperLogLog registers, which no cross-engine SQL reproduces).

Anchors are the ``n_anchors`` vertices with the smallest
``(md5(id), id)`` — a deterministic pseudo-random sample both engines
compute identically. Bit j belongs to the rank-j anchor; after R rounds
``mask(v)`` has bit j set iff anchor j reaches v in <= R hops.

Runs on the scatter-gather engine (frontier = vertices whose mask
changed, gather = bit_or — associative, so map-side partial aggregation
applies like any other gather). Rounds are bounded and the bound is
part of the query contract, mirrored by the unrolled SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fog_spark.plans.engine import Algorithm, ScatterGatherEngine, scatter_join


class AnchorReach(Algorithm):
    direction = "out"
    include_self_loops = True  # a self-loop never adds bits; keep scan simple
    uses_frontier = True
    needs_stats = True

    def __init__(self, n_anchors: int = 16, rounds: int = 8):
        if not 1 <= n_anchors <= 63:
            raise ValueError("n_anchors must be in [1, 63] (signed-long mask)")
        self.name = f"anchor_reach_{n_anchors}x{rounds}"
        self.n_anchors = n_anchors
        self.default_max_iters = rounds

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        anchors = (
            vertices.select("id", F.md5(F.col("id").cast("string")).alias("_h"))
            .orderBy("_h", "id")
            .limit(self.n_anchors)
            .withColumn("_rn", F.row_number().over(Window.orderBy("_h", "id")))
            .select("id", F.expr("shiftleft(CAST(1 AS BIGINT), _rn - 1)").alias("_bit"))
        )
        return (
            vertices.join(F.broadcast(anchors), "id", "left")
            .select(
                "id",
                F.coalesce(F.col("_bit"), F.lit(0)).cast("long").alias("mask"),
                (F.coalesce(F.col("_bit"), F.lit(0)) != 0).alias("_active"),
            )
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        return scatter_join(active_state, adj).select(
            F.explode("dsts").alias("dst"), F.col("mask")
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.bit_or("mask").alias("_gmask"), F.count("*").alias("_n_msgs")
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        new_mask = state["mask"].bitwiseOR(F.coalesce(F.col("_gmask"), F.lit(0)))
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                new_mask.alias("mask"),
                (new_mask != state["mask"]).alias("_active"),
            )
        )


def anchor_reachability(
    edges: DataFrame,
    n_anchors: int = 16,
    rounds: int = 8,
    engine: ScatterGatherEngine | None = None,
) -> DataFrame:
    """``(id, mask, n_reach)`` — which of the ``n_anchors`` sampled
    anchors reach each vertex within ``rounds`` hops, and how many."""
    eng = engine or ScatterGatherEngine(
        edges.sparkSession, checkpoint_dir=None, collect_lineage=False
    )
    res = eng.run(AnchorReach(n_anchors=n_anchors, rounds=rounds), edges)
    return res.state.select(
        "id", "mask", F.bit_count("mask").cast("long").alias("n_reach")
    )
