"""Deterministic random-walk corpus generation (DeepWalk/node2vec-style).

A training-data pipeline over a web link graph wants walk corpora — the
input to skip-gram embedding training — generated *reproducibly*: the
walk from any vertex must not depend on partitioning, task order, or
retries. So the "random" step is a hash: from vertex ``cur`` at step
``t`` of walk ``w``, the chosen out-edge index is

    idx = H(w, t, cur) mod outdeg(cur)

over the out-neighbors in ascending-dst order. Two hash families:

- ``xxhash64`` (default): JVM-side ``F.xxhash64`` over longs — the
  production fast path, no string building, whole-stage codegen.
- ``md5``: first 12 hex chars of ``md5("w:t:cur")`` as a 48-bit int —
  bit-portable to SQL engines (DuckDB computes the identical index), so
  the corpus is hash-checkable cross-engine. Same idiom as
  ``operators.dedup.simhash_md5``.

Vertices with no out-edges are absorbing: a walk that lands on one stays
there, so every walk has exactly ``walk_len + 1`` rows. One walk starts
per vertex with >= 1 out-edge (walk_id = start vertex id).

Scale shape (the part that matters at 10^12 edges): the neighbor pick is
a join against a *ranked edge table* ``(src, idx, dst)`` on the
composite key ``(src, idx)`` — never against a grouped-adjacency array
row. A 10^8-out-degree hub is 10^8 separate rows spread by hash(src,
idx) across all partitions; each step touches exactly ONE of them per
walk through that hub, so hub skew cannot concentrate in a task (the
array form would ship and probe an ~800MB row per hub per step). Each
edge row also carries deg(dst), so the state always knows deg(cur)
from the step that picked it — one join per step, against the ranked
table pinned by (src, idx), materialized once and reused for every
step. L steps cost L state-sized shuffles, never L edge-table shuffles.

Not in the reference (FOG's roadmap stops at graph algorithms,
/root/reference/TODO.list:16-21); this is the training-data extension
the north rule's corpus context asks for.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import _SER, Materializer


def _step_hash(hash_fn: str, step: int):
    """Column: H(walk_id, step, cur) as a non-negative long."""
    if hash_fn == "xxhash64":
        # sign-safe: pmod later; xxhash64 spans the full signed range
        return F.xxhash64(F.col("walk_id"), F.lit(step).cast("long"), F.col("cur"))
    if hash_fn == "md5":
        s = F.concat_ws(
            ":",
            F.col("walk_id").cast("string"),
            F.lit(str(step)),
            F.col("cur").cast("string"),
        )
        # 12 hex chars = 48 bits, always positive, exact in a long
        return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def random_walks(
    edges: DataFrame,
    walk_len: int = 8,
    hash_fn: str = "xxhash64",
    walks_per_vertex: int = 1,
) -> DataFrame:
    """``(walk_id, step, vertex)`` — ``walks_per_vertex`` deterministic
    walks of ``walk_len`` steps per vertex with >= 1 out-edge; step 0 is
    the start vertex itself. ``walk_id = start * walks_per_vertex + j``
    (the identity when walks_per_vertex=1), and the step hash keys on
    walk_id, so sibling walks from one start diverge. Multi-edges are
    kept (an edge listed twice is twice as likely to be picked),
    matching unweighted corpus practice.
    """
    spark = edges.sparkSession
    M = Materializer(spark)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = G.normalize_edges(edges).select("src", "dst")
    # ranked edge table: idx in [0, outdeg) over ascending dst, plus the
    # out-degree of the EDGE TARGET (_rddeg). Carrying deg(dst) on the
    # edge row means the walk state always knows deg(cur) — fetched when
    # cur was picked — so each step is ONE join, not a deg join plus a
    # pick join. The ranking comes from graph.ranked_out_edges: hub-safe
    # (range-chunked two-phase rank past hub_threshold — no task ever
    # sorts a hub's full edge list), byte-identical idx either way,
    # built once and reused for every step. Unique column names
    # (_r*/_g*) because ranked/deg share lineage with e and the per-step
    # joins would otherwise be ambiguous self-joins.
    # one persisted degree frame feeds the ranked-build stats, the
    # ranked table's deg(dst) join and the walk-state init — one
    # full-edge degree aggregation instead of three (review finding);
    # freed right after the last of those materializes below
    deg0 = e.groupBy("src").agg(F.count("*").alias("_deg")).persist(_SER)
    deg = deg0.select(
        F.col("src").alias("_gsrc"), F.col("_deg").alias("_gdeg")
    )
    # persist (NOT localCheckpoint): an InMemoryTableScan keeps the
    # repartition's HashPartitioning visible to every step's planner, so
    # the ranked side joins with NO exchange; a localCheckpoint scan
    # reports UnknownPartitioning and would re-shuffle (or re-broadcast)
    # the full edge table once per step.
    ranked = (
        G.ranked_out_edges(e, deg=deg0)
        .select(
            F.col("src").alias("_rsrc"),
            F.col("dst").alias("_rdst"),
            F.col("idx").alias("_ridx"),
        )
        .join(deg, F.col("_rdst") == F.col("_gsrc"), "left")
        .select("_rsrc", "_rdst", "_ridx", F.col("_gdeg").alias("_rddeg"))
        .repartition(nparts, "_rsrc", "_ridx")
        .persist(_SER)
    )
    ranked.count()

    W = int(walks_per_vertex)
    if W < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    state = M.checkpoint(
        deg.select(
            F.explode(F.sequence(F.lit(0), F.lit(W - 1))).alias("_j"),
            F.col("_gsrc").alias("cur"),
            F.col("_gdeg").alias("_cdeg"),
        ).select(
            (F.col("cur") * W + F.col("_j")).cast("long").alias("walk_id"),
            "cur",
            "_cdeg",
        )
    )
    deg0.unpersist()  # ranked + state are materialized; cache done
    snapshots = [state]  # step 0
    for t in range(1, walk_len + 1):
        h = _step_hash(hash_fn, t)
        picked = (
            state.withColumn(
                "_idx",
                F.when(F.col("_cdeg").isNotNull(), F.pmod(h, F.col("_cdeg"))),
            )
            .join(
                ranked,
                (F.col("cur") == F.col("_rsrc")) & (F.col("_idx") == F.col("_ridx")),
                "left",
            )
            .select(
                "walk_id",
                F.coalesce(F.col("_rdst"), F.col("cur")).alias("cur"),
                # moved: deg of the new vertex came with the edge row;
                # absorbed (no match): cur and its (null-able) deg persist
                F.when(F.col("_rdst").isNotNull(), F.col("_rddeg"))
                .otherwise(F.col("_cdeg"))
                .alias("_cdeg"),
            )
        )
        state = M.checkpoint(picked)
        snapshots.append(state)

    out = reduce(
        lambda a, b: a.unionByName(b),
        (
            s.select(
                "walk_id",
                F.lit(k).cast("long").alias("step"),
                F.col("cur").alias("vertex"),
            )
            for k, s in enumerate(snapshots)
        ),
    )
    result = M.checkpoint(out)
    for s in snapshots:
        M.free(s)
    ranked.unpersist()
    return result
