"""Bow-tie decomposition of a directed web graph (Broder et al.,
"Graph structure in the Web", WWW 2000).

THE canonical structural census of a crawl: every vertex lands in
exactly one region relative to the largest strongly connected
component —

    CORE         the largest SCC
    IN           reaches CORE, not in it
    OUT          reachable from CORE, not in it
    TUBE         on an IN -> OUT path that avoids CORE
    TENDRIL_IN   reachable from IN, reaches neither CORE nor OUT
    TENDRIL_OUT  reaches OUT, reachable from neither CORE nor IN
    DISC         everything else (disconnected from the bow-tie)

The reference engine family stops at single algorithms; the bow-tie is
a composition of ones this repo already has, which is the point —
SCC (algos/scc.py FW-BW coloring) picks the core, then FOUR
multi-source frontier reachability runs (algos/traversal.SetBFS, the
TARGET-engine shape: only the frontier scatters, empty frontier stops):

    F  = forward-reach(CORE)            B  = backward-reach(CORE)
    FI = forward-reach(IN)              BO = backward-reach(OUT)

and the region is a pure per-vertex expression over five boolean flags
(core, F, B, FI, BO) assembled with vertex-sized left joins — no
iteration, no collect beyond the 1-row core-label argmax. Backward
reachability reuses the SAME engine on the reversed edge frame (one
column swap; Catalyst plans it identically). Empty-IN / empty-OUT seed
sets short-circuit inside SetBFS (no frontier -> 0 iterations).

Scale: the four reachability runs are each O(diameter) frontier rounds
over the pinned adjacency — the same cost profile as CC on the same
graph; at 10^12 documents the dominant term is the SCC itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.algos.scc import scc
from fog_spark.algos.traversal import UNREACHED_LEVEL, SetBFS
from fog_spark.plans.engine import ScatterGatherEngine
from fog_spark.plans.materialize import Materializer

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL_IN", "TENDRIL_OUT", "DISC")


def _reach_flag(engine: ScatterGatherEngine, edges: DataFrame, seeds: DataFrame,
                name: str, vertices: DataFrame) -> DataFrame:
    """(id, <name>:boolean) — true iff reachable from the seed set
    (seeds themselves included, level 0). The explicit vertex frame
    keeps self-loop-only vertices in every run's state, so the final
    flag joins are lossless inner joins.

    The flag frame is eagerly checkpointed through the engine's own
    materializer and the run's state cache freed HERE — returning the
    lazy select left four vertex-sized engine states unreclaimable per
    bowtie() call (the hostgraph.host_pagerank_milli discipline)."""
    res = engine.run(SetBFS(seeds, name=name), edges, vertices=vertices)
    out = engine.mat.checkpoint(
        res.state.select("id", (F.col("level") < UNREACHED_LEVEL).alias(name))
    )
    engine.mat.free(res.state)
    return out


def bowtie(edges: DataFrame, max_scc_rounds: int = 25) -> DataFrame:
    """``(id, region)`` for every vertex of ``edges``, region one of
    :data:`REGIONS`. The core is the largest SCC (ties broken by the
    smallest SCC label, so the result is deterministic)."""
    spark = edges.sparkSession
    M = Materializer(spark)
    e = M.checkpoint(G.normalize_edges(edges).select("src", "dst"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    # scc() returns an already-checkpointed, tag-freeable frame —
    # re-checkpointing it here would copy the blocks and leak the inner
    labels = scc(e, max_rounds=max_scc_rounds)
    core_row = (
        labels.groupBy("scc")
        .count()
        .orderBy(F.col("count").desc(), F.col("scc").asc())
        .limit(1)
        .collect()[0]
    )
    core_label = core_row["scc"]
    core = M.checkpoint(
        labels.where(F.col("scc") == core_label).select("id")
    )

    verts = labels.select("id")
    engine = ScatterGatherEngine(spark, checkpoint_dir=None)
    fwd = _reach_flag(engine, e, core, "f_core", verts)
    bwd = _reach_flag(engine, rev, core, "b_core", verts)

    in_set = (
        bwd.where("b_core")
        .join(core, "id", "left_anti")
        .select("id")
    )
    out_set = (
        fwd.where("f_core")
        .join(core, "id", "left_anti")
        .select("id")
    )
    fwd_in = _reach_flag(engine, e, in_set, "f_in", verts)
    bwd_out = _reach_flag(engine, rev, out_set, "b_out", verts)

    is_core = F.col("scc") == F.lit(core_label)
    region = (
        F.when(is_core, F.lit("CORE"))
        .when(F.col("b_core"), F.lit("IN"))
        .when(F.col("f_core"), F.lit("OUT"))
        .when(F.col("f_in") & F.col("b_out"), F.lit("TUBE"))
        .when(F.col("f_in"), F.lit("TENDRIL_IN"))
        .when(F.col("b_out"), F.lit("TENDRIL_OUT"))
        .otherwise(F.lit("DISC"))
    )
    out = (
        labels.join(fwd, "id")
        .join(bwd, "id")
        .join(fwd_in, "id")
        .join(bwd_out, "id")
        .select("id", region.alias("region"))
    )
    result = M.checkpoint(out)
    for frame in (fwd, bwd, fwd_in, bwd_out, core, labels, e):
        M.free(frame)
    return result


def bowtie_census(edges: DataFrame, max_scc_rounds: int = 25) -> DataFrame:
    """One row per region with its vertex count — the headline numbers
    of the Broder paper (CORE/IN/OUT roughly a quarter each on the 1999
    web). Regions absent from the graph are omitted."""
    return (
        bowtie(edges, max_scc_rounds=max_scc_rounds)
        .groupBy("region")
        .agg(F.count("*").alias("n_vertices"))
    )
