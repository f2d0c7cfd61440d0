"""Connected components via hash-min label exchange.

Reference: /root/reference/application/cc.hpp:17-163 — component_root
initialized to vid, min label propagated forward over out-edges then
backward over in-edges per iteration (TARGET engine, self-loops skipped,
cpu_thread.cpp:235-239), vertex re-scheduled only when its label drops.

Here fwd+bwd collapses into one pass over the symmetrized adjacency —
identical fixpoint (min vid per weakly-connected component), fewer
iterations. Frontier-driven: only vertices whose label changed scatter
next round, and the engine broadcasts the frontier once it shrinks below
threshold (the shrinking-frontier phase dominates rounds on web graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.plans.engine import Algorithm, scatter_join


class ConnectedComponents(Algorithm):
    direction = "sym"
    uses_frontier = True
    include_self_loops = False
    default_max_iters = 200

    def __init__(self):
        self.name = "connected_components"

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.col("id").alias("component"), F.lit(True).alias("_active")
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        return (
            scatter_join(active_state, adj)
            .select(F.explode("dsts").alias("dst"), F.col("component").alias("comp"))
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.min("comp").alias("_min_comp"), F.count("*").alias("_n_msgs")
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        changed = F.col("_min_comp") < F.col("component")
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                F.when(changed, F.col("_min_comp"))
                .otherwise(F.col("component"))
                .alias("component"),
                F.coalesce(changed, F.lit(False)).alias("_active"),
            )
        )


def component_sizes(state: DataFrame) -> DataFrame:
    """(component, size) — finalize analog; cc.hpp:106-123 counts roots."""
    return state.groupBy("component").agg(F.count("*").alias("size"))
