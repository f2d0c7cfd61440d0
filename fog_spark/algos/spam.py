"""Spam mass — link-spam demotion by trust-vs-rank mass comparison.

Gyongyi, Berkhin, Garcia-Molina, Pedersen, "Link Spam Detection Based on
Mass Estimation" (VLDB 2006): a page's *spam mass* is the fraction of its
PageRank that does NOT flow from a trusted core,

    spam_mass(v) = (PR(v) - TR(v)) / PR(v)

with PR the uniform-teleport PageRank and TR the trust-seeded
personalized PageRank (TrustRank) rescaled to the same total mass. High
spam mass = rank held up almost entirely by untrusted link structure —
the demotion / crawl-deprioritization signal that complements TrustRank's
promotion signal.

The reference engine family stops at plain PageRank
(/root/reference/TODO.list:16-21); this composes two fixpoints the repo
already owns. Everything is integer-exact (the milli-twin discipline):

    pr(v)       : uniform integer PageRank — rank_0 = 1_000_000 and a
                  per-vertex teleport of 150_000 each iteration (i.e.
                  n * the unit-mass recurrence; no driver-side n needed)
    tr(v)       : TrustRankMilli over the seed set (total mass ~1e6)
    tr_norm(v)  = (tr(v) * S_pr) div S_tr      -- rescale to PR's mass
    spam_permille(v) = ((pr(v) - tr_norm(v)) * 1000) div pr(v)

`div` truncates toward zero identically in Spark and DuckDB for the
operand signs here, so every score is a deterministic BIGINT.

Overflow headroom: tr <= ~1e6 and S_pr <= n * 1e6, so tr * S_pr needs
n <= ~9e6 to stay inside int64 — fine for the exact small-scale twin.
At the 10^12-page scale run the float StandardPageRank + a float trust
run and compute the ratio in doubles; the integer twin exists to make
the small-scale oracle hash-exact, like every other *_milli sibling.

Scale shape: two engine fixpoints (each the audited one-shuffle-per-
iteration scatter-gather loop), two scalar sums folded into one agg,
one final state join. Nothing new on the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fog_spark.algos.pagerank import PPRMilli, TrustRankMilli


class UniformPageRankMilli(PPRMilli):
    """Integer PageRank with the UNIFORM teleport vector: every vertex
    starts at 1_000_000 and receives a 150_000 teleport each iteration.
    This is the unit-mass damped power iteration scaled by n (the vertex
    count cancels out of the per-vertex recurrence), so no global count
    enters the arithmetic and the SQL oracle replays it bit-for-bit."""

    def __init__(self, niters: int = 8):
        super().__init__(seed=0, niters=niters)
        self.name = "uniform_pagerank_milli"

    def init_state(self, vertices: DataFrame, adj: DataFrame) -> DataFrame:
        return vertices.select(
            "id",
            F.lit(1_000_000).cast("long").alias("rank_milli"),
            F.lit(True).alias("_active"),
        )

    def apply(self, state: DataFrame, gathered: DataFrame) -> DataFrame:
        return (
            state.join(gathered, state["id"] == gathered["dst"], "left")
            .select(
                state["id"],
                (F.coalesce(F.col("_sum"), F.lit(0)) + F.lit(150_000))
                .cast("long")
                .alias("rank_milli"),
                F.lit(True).alias("_active"),
            )
        )


def spam_mass_milli(
    spark: SparkSession,
    edges: DataFrame,
    trust_seeds: list[int] | tuple[int, ...],
    niters: int = 8,
    engine=None,
    materializer=None,
) -> DataFrame:
    """``(id, pr_milli, trust_milli, spam_permille)`` — spam_permille in
    [-inf, 1000]: ~1000 = rank with no trusted support (spam-shaped),
    <= 0 = more trust-sourced mass than total rank (whitelist-shaped).
    Vertices with pr = 0 (unreachable, teleport-only never happens here
    since every vertex teleports) cannot occur; the recurrence gives
    pr >= 150_000 after iteration 1.

    ``materializer``: a plans.materialize.Materializer. When given, the
    scored frame is eagerly checkpointed through it and the two engine
    state caches are reclaimed before returning (library-call hygiene —
    same discipline as hostgraph.host_pagerank_milli); when omitted the
    lazy frame keeps both cached states alive until the session drops
    them.
    """
    if engine is None:
        from fog_spark.plans.engine import ScatterGatherEngine

        engine = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    res_pr = engine.run(UniformPageRankMilli(niters=niters), edges, max_iters=niters)
    pr = res_pr.state.select("id", F.col("rank_milli").alias("pr_milli"))
    res_tr = engine.run(
        TrustRankMilli(seeds=trust_seeds, niters=niters), edges, max_iters=niters
    )
    tr = res_tr.state.select("id", F.col("rank_milli").alias("tr_raw"))
    joined = pr.join(tr, "id")
    sums = joined.agg(
        F.sum("pr_milli").alias("s_pr"), F.sum("tr_raw").alias("s_tr")
    )
    # s_tr == 0 means NO trust seed exists in the graph (typo'd seed ids,
    # or seeds that are dangling-isolated): defaulting trust to 0 would
    # silently score EVERY vertex spam_permille=1000 — an all-spam verdict
    # indistinguishable from a real one. Fail loudly instead, mirroring
    # hostgraph.host_spam_mass's empty-seed-intersection error (ADVICE
    # r03). The 1-row collect is a bounded driver scalar; engine state is
    # already materialized at this point.
    srow = sums.collect()[0]
    if not srow["s_tr"] or srow["s_tr"] <= 0:
        raise ValueError(
            f"spam_mass_milli: no trust mass — none of trust_seeds "
            f"{list(trust_seeds)!r} accumulated TrustRank (absent or "
            f"isolated seed ids?); refusing the vacuous all-spam verdict"
        )
    # the scalars are already on the driver — inject them as literals
    # rather than crossJoin(broadcast(sums)): the sums subtree embedded
    # in the output plan would otherwise RE-RUN the pr-join-tr aggregate
    # on the next action (Spark does not dedupe it against the collect
    # above), doubling the vertex-sized join+agg work
    s_pr, s_tr = int(srow["s_pr"]), int(srow["s_tr"])
    out = (
        joined
        .select(
            "id",
            "pr_milli",
            F.expr(f"(tr_raw * {s_pr}) div {s_tr}")
            .cast("long")
            .alias("trust_milli"),
        )
        .select(
            "id",
            "pr_milli",
            "trust_milli",
            F.expr("((pr_milli - trust_milli) * 1000) div pr_milli")
            .cast("long")
            .alias("spam_permille"),
        )
    )
    if materializer is not None:
        out = materializer.checkpoint(out)
        engine.mat.free(res_pr.state)
        engine.mat.free(res_tr.state)
    return out
