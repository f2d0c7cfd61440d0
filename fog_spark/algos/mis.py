"""Maximal independent set: Luby's algorithm with hash priorities.

Luby (1986): each round every undecided vertex draws a priority; a
vertex whose priority beats every undecided neighbor's joins the MIS and
knocks its neighbors out; O(log n) rounds in expectation. Here the draw
is the usual deterministic hash — priority of vertex v in round r is the
pair ``(H48(r, v), v)`` (the id tie-break makes priorities total, so the
result is a pure function of the edge set, reproducible across engines,
partitionings, and retries).

Undirected simple semantics: edges are symmetrized, self-loops dropped
(a self-loop would make its vertex ineligible forever under strict
neighbor comparison; standard MIS is defined on simple graphs).
Isolated vertices (only self-loops / no neighbors) join the MIS in
round 1 vacuously.

Rounds are BOUNDED (``max_rounds``) and the bound is part of the query
contract (the oracle unrolls the same rounds); vertices still undecided
at the bound keep status 0. On hash priorities the expected round count
is ~log2(n), so the default bound of 12 covers the gate graphs to
fixpoint — the loop exits early via the engine-style count check.

Scale shape per round: one bidirectional join of the undecided edge set
against the undecided vertex set (priorities are computed, not stored),
one groupBy counting better-priority neighbors (map-side combinable),
one semi-join to knock out neighbors of new MIS vertices. The edge set
shrinks monotonically — same cost class as a k-core peel round.

Not in the reference (FOG's roadmap stops at SCC/MSF,
/root/reference/TODO.list:16-21); standard published semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import Materializer

_H48 = 1 << 48


def _prio(hash_fn: str, rnd: int, id_col):
    """48-bit non-negative priority hash of (round, id)."""
    if hash_fn == "xxhash64":
        return F.pmod(
            F.xxhash64(F.lit(rnd).cast("long"), id_col), F.lit(_H48).cast("long")
        )
    if hash_fn == "md5":
        s = F.concat_ws(":", F.lit(str(rnd)), id_col.cast("string"))
        return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def maximal_independent_set(
    edges: DataFrame, max_rounds: int = 12, hash_fn: str = "xxhash64"
) -> DataFrame:
    """``(id, in_mis)`` — Luby MIS over the symmetrized simple graph;
    ``in_mis`` is NULL for vertices still undecided at ``max_rounds``
    (none on any graph the bound covers — the column is boolean so the
    truncation is visible, not silently wrong)."""
    M = Materializer(edges.sparkSession)
    e = G.normalize_edges(edges)
    # symmetric neighbor list over the simple graph
    und = M.checkpoint(
        e.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionByName(
            e.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )
    verts = M.checkpoint(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    decided = None  # (id, in_mis)
    undecided = verts
    live = und
    for r in range(1, max_rounds + 1):
        p = _prio(hash_fn, r, F.col("id"))
        pr = undecided.select("id", p.alias("_h"))
        # count undecided neighbors with strictly better (smaller)
        # (_h, id); vertices with zero better neighbors join the MIS.
        # live edges run between undecided vertices only, so a vertex
        # with no live edge row is isolated and joins vacuously.
        nb = (
            live.join(pr.withColumnRenamed("id", "src").withColumnRenamed("_h", "_sh"), "src")
            .join(pr.withColumnRenamed("id", "dst").withColumnRenamed("_h", "_dh"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum(
                    F.when(
                        (F.col("_dh") < F.col("_sh"))
                        | ((F.col("_dh") == F.col("_sh")) & (F.col("dst") < F.col("src"))),
                        1,
                    ).otherwise(0)
                ).alias("_better")
            )
        )
        winners = M.checkpoint(
            undecided.join(nb, "id", "left")
            .where(F.coalesce(F.col("_better"), F.lit(0)) == 0)
            .select("id")
        )
        losers = M.checkpoint(
            live.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(winners, "id", "left_anti")
        )
        newly = winners.select("id", F.lit(True).alias("in_mis")).unionByName(
            losers.select("id", F.lit(False).alias("in_mis"))
        )
        decided = (
            M.swap(decided, decided.unionByName(newly))
            if decided is not None
            else M.checkpoint(newly)
        )
        undecided2 = M.checkpoint(
            undecided.join(decided, "id", "left_anti")
        )
        n_left = undecided2.count()
        M.free(winners)
        M.free(losers)
        M.free(undecided) if undecided is not verts else None
        undecided = undecided2
        if n_left == 0:
            break
        live = M.swap(
            live,
            live.join(undecided.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(undecided.withColumnRenamed("id", "dst"), "dst", "left_semi"),
        )
    out = verts.join(decided, "id", "left").select("id", "in_mis")
    result = M.checkpoint(out)
    M.free(decided)
    M.free(undecided) if undecided is not verts else None
    M.free(verts)
    M.free(live)
    M.free(und) if live is not und else None
    return result
