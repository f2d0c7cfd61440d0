"""Synchronous label propagation (north_rule N1 — absent from FOG, listed
as future work in /root/reference/TODO.list:16-21).

Semantics (SURVEY §2.4-N1): label_0(v)=v; each iteration every vertex
adopts the most frequent label among its (symmetrized, self-loop-free)
neighbors, ties broken by smallest label; vertices with no neighbors keep
their label. Early-stops when an iteration changes nothing; capped at
max_iters because sync LPA can 2-cycle on bipartite structures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fog_spark.plans.engine import Algorithm


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
            active_state.join(adj, active_state["id"] == adj["src"])
            .select(F.explode("dsts").alias("dst"), F.col("label"))
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        # two-level: count per (dst,label) with map-side combine, then a
        # per-dst window picks the winner. The window repartitions only the
        # already-aggregated (dst,label) pairs, not raw messages.
        counts = msgs.groupBy("dst", "label").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("dst")
        ranked = counts.select(
            "dst",
            "label",
            "cnt",
            F.sum("cnt").over(w).alias("_n_msgs"),
            F.row_number()
            .over(w.orderBy(F.col("cnt").desc(), F.col("label").asc()))
            .alias("_rn"),
        )
        return ranked.where(F.col("_rn") == 1).select(
            "dst", F.col("label").alias("_new_label"), "_n_msgs"
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
