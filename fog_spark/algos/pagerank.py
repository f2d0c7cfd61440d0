"""PageRank, two variants.

**FogPageRank** reproduces the reference recurrence EXACTLY
(/root/reference/application/pagerank.hpp:37-94, scatter at
fogsrc/cpu_thread.cpp:474-484):

    rank_0(v) = 1.0
    rank_t(v) = rank_{t-1}(v) + sum_{u->v} (0.85 * rank_{t-1}(u)/outdeg(u) + 0.15)

Nonstandard on purpose: no damping reset, the (1-d) term is added per
in-edge, ranks grow monotonically; vertices with outdeg==0 emit nothing;
self-loops DO contribute (GLOBAL engine keeps them). Runs a fixed number
of iterations (default 10, --pagerank::niters). This is the 1e-6
correctness target.

**StandardPageRank** is the benchmark variant (BASELINE.json metric):
damped + dangling-mass redistribution, stops when max per-vertex delta
< tol (default 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.plans.engine import Algorithm, scatter_join


class FogPageRank(Algorithm):
    direction = "out"
    include_self_loops = True
    uses_frontier = False
    needs_stats = False  # fixed niters; converged() never reads stats

    def __init__(self, niters: int = 10, damping: float = 0.85):
        self.name = "fog_pagerank"
        self.niters = niters
        self.d = damping
        self.default_max_iters = niters

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.lit(1.0).alias("rank"), F.lit(True).alias("_active")
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        contrib = self.d * F.col("rank") / F.col("outdeg") + (1.0 - self.d)
        return (
            scatter_join(active_state, adj)
            .select(F.explode("dsts").alias("dst"), contrib.alias("contrib"))
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.sum("contrib").alias("_sum"), F.count("*").alias("_n_msgs")
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                (F.col("rank") + F.coalesce(F.col("_sum"), F.lit(0.0))).alias("rank"),
                F.lit(True).alias("_active"),
            )
        )

    def converged(self, iteration: int, stats) -> bool:
        # fixed-iteration algorithm: the engine's max_iters is the stop
        # (pagerank.hpp:87-94). Never flag "converged" so a checkpointed
        # run can later be resumed to a higher iteration count.
        return False


class FogPageRankMilli(Algorithm):
    """Integer-arithmetic twin of FogPageRank for cross-engine exactness:

        rank_0 = 1_000_000 (milli-units x1000)
        contrib(u) = (850 * rank(u)) div (1000 * outdeg(u)) + 150_000
        rank_t(v) = rank_{t-1}(v) + sum_{u->v} contrib(u)

    Pure long arithmetic -> results are hash-exact against any engine
    implementing the same recurrence (the driver's DuckDB oracle runs it
    as 10 chained CTEs). Float FogPageRank is the 1e-6 target; this one
    is the == target.
    """

    direction = "out"
    include_self_loops = True
    uses_frontier = False
    needs_stats = False  # fixed niters; converged() never reads stats

    def __init__(self, niters: int = 10):
        self.name = "fog_pagerank_milli"
        self.niters = niters
        self.default_max_iters = niters

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.lit(1_000_000).cast("long").alias("rank_milli"), F.lit(True).alias("_active")
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        contrib = F.expr("(850 * rank_milli) div (1000 * outdeg) + 150000")
        return (
            scatter_join(active_state, adj)
            .select(F.explode("dsts").alias("dst"), contrib.alias("contrib"))
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.sum("contrib").alias("_sum"), F.count("*").alias("_n_msgs")
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                (F.col("rank_milli") + F.coalesce(F.col("_sum"), F.lit(0))).alias("rank_milli"),
                F.lit(True).alias("_active"),
            )
        )

    def converged(self, iteration: int, stats) -> bool:
        return False


class StandardPageRank(Algorithm):
    direction = "out"
    include_self_loops = True
    uses_frontier = False

    def __init__(self, damping: float = 0.85, tol: float = 1e-6, max_iters: int = 100):
        self.name = "pagerank"
        self.d = damping
        self.tol = tol
        self.default_max_iters = max_iters
        self._n: int | None = None

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        self._n = vertices.count()
        srcs = adj.select(F.col("src").alias("id")).distinct()
        return (
            vertices.join(srcs.withColumn("_has_out", F.lit(True)), "id", "left")
            .select(
                "id",
                F.lit(1.0 / self._n).alias("rank"),
                F.coalesce(F.col("_has_out"), F.lit(False)).alias("has_out"),
                F.lit(True).alias("_active"),
            )
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        return (
            scatter_join(active_state, adj)
            .select(
                F.explode("dsts").alias("dst"),
                (F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
        )

    def gather(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(
            F.sum("contrib").alias("_sum"), F.count("*").alias("_n_msgs")
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        # dangling mass (ranks with no out-edges, redistributed uniformly)
        # and the vertex count are computed as a plan-side scalar aggregate
        # broadcast-cross-joined in — no driver collect per iteration, and
        # no dependence on driver-held state (self._n), so a checkpointed
        # run resumes correctly (the resume path skips init_state).
        totals = F.broadcast(
            state.agg(
                F.count("*").cast("double").alias("_nv"),
                F.coalesce(
                    F.sum(F.when(~F.col("has_out"), F.col("rank"))), F.lit(0.0)
                ).alias("_dm"),
            )
        )
        base = (1.0 - self.d) / F.col("_nv") + self.d * F.col("_dm") / F.col("_nv")
        new_rank = base + self.d * F.coalesce(F.col("_sum"), F.lit(0.0))
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .crossJoin(totals)
            .select(
                state["id"],
                new_rank.alias("rank"),
                "has_out",
                F.lit(True).alias("_active"),
                F.abs(new_rank - F.col("rank")).alias("_delta"),
            )
        )

    def converged(self, iteration: int, stats) -> bool:
        md = stats.get("max_delta")
        return md is not None and md < self.tol
