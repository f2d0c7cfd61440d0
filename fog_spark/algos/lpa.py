"""Synchronous label propagation (north_rule N1 — absent from FOG, listed
as future work in /root/reference/TODO.list:16-21).

Semantics (SURVEY §2.4-N1): label_0(v)=v; each iteration every vertex
adopts the most frequent label among its (symmetrized, self-loop-free)
neighbors, ties broken by smallest label; vertices with no neighbors keep
their label. Early-stops when an iteration changes nothing; capped at
max_iters because sync LPA can 2-cycle on bipartite structures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.plans.engine import Algorithm, scatter_join


class LabelPropagation(Algorithm):
    direction = "sym"
    uses_frontier = False  # GLOBAL: every vertex rescinds/readopts each iter
    include_self_loops = False

    def __init__(self, max_iters: int = 20):
        self.name = "label_propagation"
        self.default_max_iters = max_iters

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return vertices.select("id", F.col("id").alias("label"), F.lit(True).alias("_active"))

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        return (
            scatter_join(active_state, adj)
            .select(F.explode("dsts").alias("dst"), F.col("label"))
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        # two-level: count per (dst,label) with map-side combine, then ONE
        # per-dst hash aggregation picks the winner via max_by over the
        # ordering struct (cnt DESC, label ASC == max of (cnt, -label)) —
        # no window, no per-dst sort; both aggs get partial combine.
        counts = msgs.groupBy("dst", "label").agg(F.count("*").alias("cnt"))
        winner_key = F.struct(F.col("cnt"), (-F.col("label")).alias("_nl"))
        return counts.groupBy("dst").agg(
            F.max_by(F.col("label"), winner_key).alias("_new_label"),
            F.sum("cnt").alias("_n_msgs"),
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        new_label = F.coalesce(F.col("_new_label"), F.col("label"))
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                new_label.alias("label"),
                (new_label != F.col("label")).alias("_active"),
            )
        )

    def converged(self, iteration: int, stats) -> bool:
        return stats["active_count"] == 0
