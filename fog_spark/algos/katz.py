"""Katz centrality — attenuation-weighted path counting.

Katz (1953): x = sum_{t>=1} alpha^t (A^T)^t 1, i.e. every incoming path
of length t contributes alpha^t. Computed by the bounded iteration

    x_0(v)     = 0
    x_{t+1}(v) = sum_{u->v} (alpha * (x_t(u) + beta))   (replace-style)

so after T rounds x counts all paths up to length T with attenuation —
the classic in-link prestige measure that, unlike PageRank, does NOT
normalize by the linker's out-degree (a link from a hub counts full
weight; the reason spam farms inflate Katz faster than PageRank and why
the two are ranked together in link-analysis audits).

Integer-milli twin discipline: alpha as alpha_milli/1000, beta = 1000
exactly, contrib = (alpha_milli * (x + 1000)) div 1000 — bit-exact on
any engine, pytest-replayed by a pure-Python fold. Overflow bound:
x_t <= beta * (alpha * d_max)^t with d_max the max in-degree, so int64
(~9.2e18, i.e. ~9.2e15 * beta) holds through t rounds iff
(alpha * d_max)^t <= ~9.2e15 — at the default alpha = 0.1 and 8
rounds that is d_max <= ~1000, NOT 10^4; pick a smaller alpha_milli
for hubbier graphs (alpha < 1/lambda_max, the classic convergence
requirement, is stronger still and degree-aware). Sessions here run
ANSI mode, so an overflow THROWS loudly rather than wrapping.

Not in the reference (its family stops at PageRank variants,
/root/reference/TODO.list:16-21); standard published semantics. Engine
shape: identical one-shuffle-per-iteration GLOBAL scatter-gather as the
PageRank twins — message rows are two longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.plans.engine import Algorithm, scatter_join


class KatzMilli(Algorithm):
    direction = "out"
    include_self_loops = True
    uses_frontier = False
    needs_stats = False

    def __init__(self, alpha_milli: int = 100, niters: int = 8):
        if not 0 < alpha_milli < 1000:
            raise ValueError("alpha_milli must be in (0, 1000)")
        self.name = "katz_milli"
        self.alpha_milli = alpha_milli
        self.niters = niters
        self.default_max_iters = niters

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return vertices.select(
            "id",
            F.lit(0).cast("long").alias("katz_milli"),
            F.lit(True).alias("_active"),
        )

    def messages(self, active_state: DataFrame, adj: DataFrame) -> DataFrame:
        contrib = F.expr(f"({self.alpha_milli} * (katz_milli + 1000)) div 1000")
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
                F.coalesce(F.col("_sum"), F.lit(0)).cast("long").alias("katz_milli"),
                F.lit(True).alias("_active"),
            )
        )

    def converged(self, iteration: int, stats) -> bool:
        return False
