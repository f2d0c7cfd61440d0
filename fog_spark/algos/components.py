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


class WarmStartCC(ConnectedComponents):
    """Incremental connected components: re-converge on an UPDATED edge
    table starting from the previous run's labels instead of id=self.

    The crawl-to-crawl refresh twin of WarmStartPageRank, valid for edge
    ADDITIONS only: every previous label is the id of a vertex in the
    same (old ⊆ new) component, so hash-min from the warm labels still
    converges to the new component minima — additions only ever merge
    components and labels stay monotone decreasing. Edge DELETIONS can
    split a component and leave a stale too-small label that hash-min
    can never raise: callers must check the delta first
    (operators/snapshots.edge_delta — warm-start iff deleted == 0) and
    cold-run otherwise.

    With ``added_edges`` (the delta from edge_delta), only vertices
    incident to an added edge start active: everywhere else the old
    labels are already the fixpoint, so iteration 1 scatters just the
    delta frontier and label drops propagate outward from the merge
    points — rounds scale with the delta's reach, not the graph
    diameter. Without it, all vertices scatter once (still saves the
    full cold label-percolation ladder).
    """

    def __init__(self, prev_labels: DataFrame, added_edges: DataFrame | None = None):
        super().__init__()
        self.name = "cc_warm"
        self._prev = prev_labels.select("id", F.col("component").alias("_prev_comp"))
        self._added = added_edges

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        st = vertices.join(self._prev, "id", "left").select(
            "id",
            # vertices new to the graph start cold at their own id
            F.coalesce("_prev_comp", F.col("id")).alias("component"),
        )
        if self._added is None:
            return st.select("id", "component", F.lit(True).alias("_active"))
        touched = (
            self._added.select(F.col("src").alias("id"))
            .unionByName(self._added.select(F.col("dst").alias("id")))
            .distinct()
            .withColumn("_t", F.lit(True))
        )
        return st.join(touched, "id", "left").select(
            "id", "component", F.coalesce("_t", F.lit(False)).alias("_active")
        )


def component_sizes(state: DataFrame) -> DataFrame:
    """(component, size) — finalize analog; cc.hpp:106-123 counts roots."""
    return state.groupBy("component").agg(F.count("*").alias("size"))
