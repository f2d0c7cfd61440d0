"""Multi-source BFS and harmonic centrality over the directed graph.

Single-source BFS is the engine algorithm (algos/traversal.py, FOG's
TARGET engine shape, /root/reference/application/bfs.hpp). Centrality
queries want distances from a *seed set* at once; replicating the
engine run per seed costs K full traversals of the fixed per-iteration
overhead. Here the frontier carries a ``seed`` dimension instead: state
rows are ``(id, seed, dist)`` and one layered expansion advances every
seed's frontier together, so K sources cost ONE traversal whose rows
are at most K times wider — the standard MS-BFS formulation (Then et
al., "The More the Merrier: Efficient Multi-Source Graph Traversal",
VLDB 2015 — bit-packed there, row-packed here; Spark's shuffle replaces
their SIMD lanes).

Per round: frontier ⋈ edges (one shuffle on src), min per (id, seed),
anti-join against settled state (one shuffle on (id, seed)). The
settled set only grows; rounds are BOUNDED (``max_rounds``) and the
bound is part of the query contract, mirrored by the driver's unrolled
SQL oracle — identical partial results even on graphs with eccentricity
above the bound (the round-1 BFS bound-mismatch lesson, pinned on both
sides).

Harmonic centrality is exact integer math: ``sum over reached seeds of
1_000_000 // dist`` — cross-engine bit-stable where a float 1/d sum
would depend on summation order.

At 100 TB: state is at most K·V rows of 3 longs; every shuffle is keyed
by vertex id (never by seed alone), so no seed concentrates a
partition; K batches seeds if centrality over hundreds of sources is
wanted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import Materializer


def multi_source_bfs(
    edges: DataFrame,
    seeds: Sequence[int],
    max_rounds: int = 16,
) -> DataFrame:
    """``(id, seed, dist)`` — directed hop distance from every seed to
    every vertex it reaches within ``max_rounds`` hops (the seed itself
    at dist 0). Unreached (id, seed) pairs are absent, not sentinel."""
    spark = edges.sparkSession
    M = Materializer(spark)
    e = M.checkpoint(
        G.normalize_edges(edges).select("src", "dst").distinct()
    )

    seed_rows = [(int(s),) for s in dict.fromkeys(seeds)]
    state = M.checkpoint(
        spark.createDataFrame(seed_rows, "seed long").select(
            F.col("seed").alias("id"), "seed", F.lit(0).cast("long").alias("dist")
        )
    )
    frontier = state
    for _ in range(max_rounds):
        grown = (
            frontier.join(e, frontier["id"] == e["src"])
            .groupBy(e["dst"].alias("id"), "seed")
            .agg((F.min("dist") + F.lit(1)).cast("long").alias("dist"))
            .join(state.select("id", "seed"), ["id", "seed"], "left_anti")
        )
        new_frontier = M.checkpoint(grown)
        if new_frontier.isEmpty():
            M.free(new_frontier)
            break
        new_state = M.checkpoint(state.unionByName(new_frontier))
        M.free(state)
        M.free(frontier)  # no-op when frontier is still the initial state
        state = new_state
        frontier = new_frontier
    if frontier is not state:
        M.free(frontier)  # the last layer's buffer — state already holds it
    M.free(e)
    return state


def shortest_path_counts(
    edges: DataFrame,
    seeds: Sequence[int],
    max_rounds: int = 16,
) -> DataFrame:
    """``(id, seed, dist, sigma)`` — hop distance AND number of distinct
    shortest paths from each seed (Brandes' forward pass, the sigma of
    betweenness/stress centrality). Because every MS-BFS layer is
    distance-uniform per seed, sigma of a newly settled vertex is simply
    the SUM of its frontier parents' sigmas — one extra aggregate in the
    same per-round plan as ``multi_source_bfs``. Simple-graph semantics
    (parallel edges deduplicated). Counts are exact longs; on adversarial
    dense DAGs sigma grows exponentially with depth, and ANSI mode makes
    an int64 overflow throw rather than silently wrap (bounded rounds +
    the gate graphs keep it far below that)."""
    spark = edges.sparkSession
    M = Materializer(spark)
    e = M.checkpoint(
        G.normalize_edges(edges).select("src", "dst").distinct()
    )
    seed_rows = [(int(s),) for s in dict.fromkeys(seeds)]
    state = M.checkpoint(
        spark.createDataFrame(seed_rows, "seed long").select(
            F.col("seed").alias("id"),
            "seed",
            F.lit(0).cast("long").alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
    )
    frontier = state
    for _ in range(max_rounds):
        grown = (
            frontier.join(e, frontier["id"] == e["src"])
            .groupBy(e["dst"].alias("id"), "seed")
            .agg(
                (F.min("dist") + F.lit(1)).cast("long").alias("dist"),
                F.sum("sigma").cast("long").alias("sigma"),
            )
            .join(state.select("id", "seed"), ["id", "seed"], "left_anti")
        )
        new_frontier = M.checkpoint(grown)
        if new_frontier.isEmpty():
            M.free(new_frontier)
            break
        new_state = M.checkpoint(state.unionByName(new_frontier))
        M.free(state)
        M.free(frontier)
        state = new_state
        frontier = new_frontier
    if frontier is not state:
        M.free(frontier)
    M.free(e)
    return state


def sp_continuations(
    edges: DataFrame,
    seeds: Sequence[int],
    max_rounds: int = 16,
) -> DataFrame:
    """``(id, seed, dist, sigma, t_cont)`` — the integer Brandes pair:
    ``sigma`` = shortest paths seed->id, ``t_cont`` = number of
    shortest-path CONTINUATIONS from id (t(v) = 1 + sum of t(w) over
    SP-DAG successors w, i.e. dist(w) = dist(v)+1 along an edge v->w;
    the +1 counts the path ending at v itself). The product
    ``sigma * t_cont`` is the number of seed-shortest paths THROUGH or
    ENDING AT id — the stress-centrality term — computed entirely in
    exact integers where float betweenness deltas would be
    order-dependent.

    Forward pass = ``shortest_path_counts``; backward pass peels layers
    from the deepest distance down, one join + groupBy per layer
    (bounded by the actual eccentricity <= max_rounds). Simple-graph
    semantics; ANSI overflow throws rather than wraps."""
    spark = edges.sparkSession
    M = Materializer(spark)
    fwd = shortest_path_counts(edges, seeds, max_rounds=max_rounds)
    fwd = M.checkpoint(fwd)
    e = M.checkpoint(G.normalize_edges(edges).select("src", "dst").distinct())
    dmax = fwd.agg(F.max("dist")).collect()[0][0]
    # t at the deepest layer is 1 (no successors); walk upward. t rows
    # carry dist so each layer's join can demand the EXACT SP-DAG
    # successor condition dist(w) = dist(v) + 1 (an edge into a deeper or
    # shallower settled vertex is not a shortest-path continuation).
    t = M.checkpoint(
        fwd.where(F.col("dist") == dmax).select(
            "id", "seed", "dist", F.lit(1).cast("long").alias("t_cont")
        )
    )
    for d in range(int(dmax) - 1, -1, -1):
        layer = fwd.where(F.col("dist") == d)
        succ = (
            layer.join(e, layer["id"] == e["src"])
            .join(
                t.where(F.col("dist") == d + 1).select(
                    F.col("id").alias("_wid"),
                    F.col("seed").alias("_wseed"),
                    F.col("t_cont").alias("_wt"),
                ),
                (F.col("dst") == F.col("_wid")) & (F.col("seed") == F.col("_wseed")),
            )
            .groupBy(layer["id"], layer["seed"])
            .agg(F.sum("_wt").alias("_ts"))
        )
        grown = layer.join(succ, ["id", "seed"], "left").select(
            "id",
            "seed",
            "dist",
            (F.coalesce(F.col("_ts"), F.lit(0)) + F.lit(1)).cast("long").alias("t_cont"),
        )
        # t accumulates shallower layers; deeper rows stay as computed
        t = M.swap(t, t.unionByName(grown))
    out = fwd.join(
        t.select("id", "seed", "t_cont"), ["id", "seed"]
    ).select("id", "seed", "dist", "sigma", "t_cont")
    result = M.checkpoint(out)
    M.free(t)
    M.free(fwd)
    M.free(e)
    return result


def betweenness_sampled(
    edges: DataFrame,
    seeds: Sequence[int],
    max_rounds: int = 16,
) -> DataFrame:
    """``(id, betweenness)`` — Brandes betweenness restricted to the
    sampled seed set: delta_s(v) = sum over SP-DAG successors w of
    (sigma_v / sigma_w) * (1 + delta_w), summed over seeds (endpoints
    excluded). Floats (the deltas are inherently rational with
    per-vertex denominators), so this is pytest-verified against a
    pure-Python Brandes rather than gate-hashed — the integer-exact
    sibling is ``sp_continuations``. Scaling the seed sample estimates
    full betweenness (Brandes & Pich 2007). Same layered backward plan
    as sp_continuations: one join + groupBy per distance layer."""
    spark = edges.sparkSession
    M = Materializer(spark)
    fwd = M.checkpoint(shortest_path_counts(edges, seeds, max_rounds=max_rounds))
    e = M.checkpoint(G.normalize_edges(edges).select("src", "dst").distinct())
    dmax = fwd.agg(F.max("dist")).collect()[0][0]
    delta = M.checkpoint(
        fwd.where(F.col("dist") == dmax).select(
            "id", "seed", "dist", F.lit(0.0).alias("delta")
        )
    )
    for d in range(int(dmax) - 1, -1, -1):
        layer = fwd.where(F.col("dist") == d)
        succ = (
            layer.join(e, layer["id"] == e["src"])
            .join(
                delta.where(F.col("dist") == d + 1)
                .join(
                    fwd.select(
                        F.col("id").alias("_wid"),
                        F.col("seed").alias("_wseed"),
                        F.col("sigma").alias("_wsigma"),
                    ),
                    (F.col("id") == F.col("_wid")) & (F.col("seed") == F.col("_wseed")),
                )
                .select("_wid", "_wseed", "_wsigma", F.col("delta").alias("_wdelta")),
                (F.col("dst") == F.col("_wid")) & (F.col("seed") == F.col("_wseed")),
            )
            .groupBy(layer["id"], layer["seed"])
            .agg(
                F.sum((F.lit(1.0) + F.col("_wdelta")) / F.col("_wsigma")).alias("_part")
            )
        )
        grown = layer.join(succ, ["id", "seed"], "left").select(
            "id",
            "seed",
            "dist",
            (F.coalesce(F.col("_part"), F.lit(0.0)) * F.col("sigma")).alias("delta"),
        )
        delta = M.swap(delta, delta.unionByName(grown))
    out = (
        delta.where(F.col("id") != F.col("seed"))
        .groupBy("id")
        .agg(F.sum("delta").alias("betweenness"))
    )
    result = M.checkpoint(out)
    M.free(delta)
    M.free(fwd)
    M.free(e)
    return result


def ego_network(
    edges: DataFrame,
    seeds: Sequence[int],
    k: int = 2,
) -> DataFrame:
    """``(src, dst)`` — the distinct edges of the k-hop out-ego-network
    around ``seeds``: both endpoints within directed hop distance <= k
    of SOME seed (the subgraph a GNN mini-batch or a neighborhood
    sampler trains on). One MS-BFS plus two semi-joins."""
    reached = multi_source_bfs(edges, seeds, max_rounds=k).select("id").distinct()
    e = G.normalize_edges(edges).select("src", "dst").distinct()
    return (
        e.join(reached.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(reached.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )


def harmonic_centrality_milli(
    edges: DataFrame,
    seeds: Sequence[int],
    max_rounds: int = 16,
) -> DataFrame:
    """``(id, harmonic_milli)`` — integer harmonic centrality of every
    vertex reached by >= 1 seed: sum over reaching seeds (seed != id) of
    ``1_000_000 // dist``. Exact longs, cross-engine stable."""
    d = multi_source_bfs(edges, seeds, max_rounds=max_rounds)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.sum(F.expr("1000000 div dist")).cast("long").alias("harmonic_milli"),
            F.count("*").cast("long").alias("n_seeds_reaching"),
        )
    )
