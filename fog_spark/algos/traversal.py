"""Frontier traversals: BFS and SSSP (frontier-parallel Bellman-Ford).

Reference: /root/reference/application/bfs.hpp:18-133 (level = min over
in-neighbors + 1, adopt-if-smaller, stop on empty frontier) and
application/sssp.hpp:16-136 (dist + predecessor, adopt strictly smaller).
TARGET engine: self-loops skipped (cpu_thread.cpp:235-239). FOG's type1
weights are time-seeded random (process_adjlist.cpp:25-30); ours are
deterministic hash-derived so goldens exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.plans.engine import Algorithm, scatter_join

INF = float("inf")
UNREACHED_LEVEL = (1 << 62)


class BFS(Algorithm):
    direction = "out"
    uses_frontier = True
    include_self_loops = False
    default_max_iters = 10_000

    def __init__(self, root: int):
        self.name = f"bfs_from_{root}"
        self.root = root

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        is_root = F.col("id") == self.root
        return vertices.select(
            "id",
            F.when(is_root, F.lit(0)).otherwise(F.lit(UNREACHED_LEVEL)).cast("long").alias("level"),
            is_root.alias("_active"),
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        return (
            scatter_join(active_state, adj)
            .select(F.explode("dsts").alias("dst"), (F.col("level") + 1).alias("lvl"))
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.min("lvl").alias("_min_lvl"), F.count("*").alias("_n_msgs")
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        changed = F.col("_min_lvl") < F.col("level")
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                F.when(changed, F.col("_min_lvl")).otherwise(F.col("level")).alias("level"),
                F.coalesce(changed, F.lit(False)).alias("_active"),
            )
        )


class SSSP(Algorithm):
    direction = "out"
    uses_frontier = True
    include_self_loops = False
    needs_weights = True
    default_max_iters = 10_000

    def __init__(self, source: int):
        self.name = f"sssp_from_{source}"
        self.source = source

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        is_src = F.col("id") == self.source
        return vertices.select(
            "id",
            F.when(is_src, F.lit(0.0)).otherwise(F.lit(INF)).alias("dist"),
            F.when(is_src, F.lit(-1)).otherwise(F.lit(-1)).cast("long").alias("pred"),
            is_src.alias("_active"),
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        dw = F.explode(F.arrays_zip("dsts", "weights")).alias("dw")
        return (
            scatter_join(active_state, adj)
            .select(F.col("id").alias("u"), F.col("dist"), dw)
            .select(
                F.col("dw.dsts").alias("dst"),
                (F.col("dist") + F.col("dw.weights")).alias("d"),
                F.col("u").alias("p"),
            )
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        # lexicographic struct-min: smallest dist, ties -> smallest pred
        return msgs.groupBy("dst").agg(
            F.min(F.struct(F.col("d"), F.col("p"))).alias("_best"),
            F.count("*").alias("_n_msgs"),
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        changed = F.col("_best.d") < F.col("dist")
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                F.when(changed, F.col("_best.d")).otherwise(F.col("dist")).alias("dist"),
                F.when(changed, F.col("_best.p")).otherwise(F.col("pred")).alias("pred"),
                F.coalesce(changed, F.lit(False)).alias("_active"),
            )
        )


class SetBFS(BFS):
    """Multi-source BFS from a DataFrame of seed ids — level = hops from
    the NEAREST seed. The reachability primitive set-shaped analyses
    (bow-tie decomposition) need, where the seed set is itself the
    output of a previous distributed job (an SCC, a frontier slice) and
    can be millions of vertices — a literal `isin` list would not scale,
    so seeds arrive as a DataFrame and init is ONE vertex-sized join.
    Same messages/gather/apply as single-source BFS; empty seed sets
    converge immediately (no frontier, all levels UNREACHED)."""

    def __init__(self, seeds: DataFrame, name: str = "set_bfs"):
        self.name = name
        self._seeds = seeds.select(F.col(seeds.columns[0]).alias("_seed_id")).distinct()

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return (
            vertices.join(
                self._seeds, vertices["id"] == F.col("_seed_id"), "left"
            )
            .select(
                "id",
                F.when(F.col("_seed_id").isNotNull(), F.lit(0))
                .otherwise(F.lit(UNREACHED_LEVEL))
                .cast("long")
                .alias("level"),
                F.col("_seed_id").isNotNull().alias("_active"),
            )
        )
