"""Minimum spanning forest — Borůvka rounds as DataFrame fixpoints.

MSF is on the reference's roadmap alongside SCC and triangle counting
(/root/reference/TODO.list:16-21) but was never implemented there; we
define the standard semantics: for each connected component of the
undirected weighted graph, the forest of edges with minimal total weight.
Weights are the engine's deterministic hash-derived weights (FIXTURES F2)
so ties are stable and results are exactly testable against a Kruskal
oracle.

Borůvka maps naturally onto scatter/gather:

1. canonicalize: undirected edge set, one row per vertex pair
   ``(a < b, w)`` keeping the min weight (and min original (src,dst) on
   ties) per pair;
2. per round: every component picks its lightest outgoing edge
   (``min_by`` over struct-ordered (w, a, b) — deterministic total
   order), those edges join the forest;
3. contract: hash-min fixpoint over the picked edges updates component
   labels (the picked graph is a forest, so this converges in
   O(log |V|) pointer-jumping-style iterations);
4. stop when no cross-component edge remains.

Component count at least halves per round => <= log2(V) rounds, each a
constant number of shuffles — the textbook O(E log V) distributed MSF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import Materializer


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """(a, b, w) with a < b, min weight per pair; self-loops dropped
    (never in any MSF)."""
    e = G.normalize_edges(edges)
    if "weight" not in e.columns:
        raise ValueError("MSF requires a weight column")
    return (
        e.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


# Below this many picked edges the contraction graph is collected and
# union-found on the driver in one job. Collected via Arrow (two int64
# columns — 16 B/pair + pyarrow buffer overhead, ~4 MB at the cap; a
# Row-object collect costs ~10x that in Python object headers, which is
# why the old 2M-row cap was memory-naive). At 10^12-vertex scale
# the first Borůvka rounds stay on the distributed path and later rounds
# (components shrink at least geometrically) flip to the driver path
# automatically.
DRIVER_CONTRACT_CAP = 250_000


def _union_find_min(pairs) -> dict[int, int]:
    """Driver-side union-find over (a, b) pairs; the root of every set is
    its minimum element (matching distributed hash-min semantics), so the
    result is schedule-independent."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb
    return {x: find(x) for x in nodes}


def _contract(
    M: Materializer,
    comp: DataFrame,
    picked: DataFrame,
    max_iters: int = 64,
    driver_cap: int = DRIVER_CONTRACT_CAP,
) -> DataFrame:
    """Union the endpoints of picked edges. comp: (id, comp); picked:
    (ca, cb) component pairs (ca != cb).

    Small contraction graphs (<= driver_cap pairs) are solved exactly on
    the driver with union-find — one collect + one broadcast relabel join,
    instead of thousands of sequential fixpoint barriers. Large ones run a
    distributed hash-min + pointer-doubling fixpoint on a FIXED
    ceil(log2(n))+2 schedule (doubling covers 2^k hops after k rounds)
    with a single stability check at the end — no per-hop blocking counts.
    """
    import math

    n_pairs = picked.count()
    spark = comp.sparkSession
    if n_pairs <= driver_cap:
        # Arrow transfer: two long columns, no per-row Python Row objects
        tbl = picked.select("ca", "cb").toArrow()
        mapping = _union_find_min(
            zip(tbl.column("ca").to_pylist(), tbl.column("cb").to_pylist())
        )
        lbl_df = spark.createDataFrame(
            [(c, l) for c, l in mapping.items()], "c long, lbl long"
        )
        return M.swap(
            comp,
            comp.join(F.broadcast(lbl_df), comp["comp"] == F.col("c"), "left")
            .select("id", F.coalesce("lbl", "comp").alias("comp")),
        )

    m = picked.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
    m = M.checkpoint(m.unionByName(m.select(F.col("y").alias("x"), F.col("x").alias("y"))))
    lbl = M.checkpoint(
        m.select(F.col("x").alias("c")).distinct()
        .select("c", F.col("c").alias("lbl"))
    )
    schedule = int(math.ceil(math.log2(max(n_pairs, 2)))) + 2
    converged = False
    for _ in range(max_iters):
        for _hop in range(schedule):
            # one hash-min hop over the picked graph ...
            msgs = (
                lbl.join(m, lbl["c"] == m["x"])
                .groupBy(m["y"].alias("mc"))
                .agg(F.min("lbl").alias("mlbl"))
            )
            hop = lbl.join(msgs, lbl["c"] == F.col("mc"), "left").select(
                "c", F.least("lbl", F.coalesce("mlbl", "lbl")).alias("lbl")
            )
            # ... then pointer doubling (lbl <- min(lbl, lbl[lbl])) so
            # monotone chains collapse in O(log n) rounds instead of O(n)
            parent = hop.select(F.col("c").alias("pc"), F.col("lbl").alias("plbl"))
            lbl = M.swap(
                lbl,
                hop.join(parent, hop["lbl"] == F.col("pc"), "left")
                .select("c", F.least("lbl", F.coalesce("plbl", "lbl")).alias("lbl")),
            )
        unstable = (
            lbl.join(m, lbl["c"] == m["x"])
            .join(
                lbl.select(F.col("c").alias("yc"), F.col("lbl").alias("ylbl")),
                m["y"] == F.col("yc"),
            )
            .where(F.col("lbl") < F.col("ylbl"))
        )
        if unstable.isEmpty():
            converged = True
            break
        schedule = max(2, schedule // 2)
    if not converged:
        M.free(lbl)
        M.free(m)
        raise RuntimeError("msf._contract: label fixpoint did not converge")
    out = M.swap(
        comp,
        comp.join(lbl, comp["comp"] == lbl["c"], "left")
        .select("id", F.coalesce("lbl", "comp").alias("comp")),
    )
    M.free(lbl)
    M.free(m)
    return out


def msf(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Forest edges (a, b, w); total weight is minimal per component.
    Deterministic under ties via the total order (w, a, b)."""
    M = Materializer(edges.sparkSession)
    und = M.checkpoint(canonical_undirected(edges))
    spark = und.sparkSession
    comp = M.checkpoint(
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
    )
    forest = spark.createDataFrame([], "a long, b long, w double")

    for _ in range(max_rounds):
        ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
        cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
        live = M.checkpoint(
            und.join(ca, "a").join(cb, "b").where(F.col("ca") != F.col("cb"))
        )
        if live.isEmpty():
            M.free(live)
            break
        # lightest outgoing edge per component, from both endpoints' view
        cand = live.select(F.col("ca").alias("c"), "a", "b", "w", "ca", "cb").unionByName(
            live.select(F.col("cb").alias("c"), "a", "b", "w", "ca", "cb")
        )
        key = F.struct("w", "a", "b")
        picked = (
            cand.groupBy("c")
            .agg(F.min_by(F.struct("a", "b", "w", "ca", "cb"), key).alias("e"))
            .select("e.a", "e.b", "e.w", "e.ca", "e.cb")
            .distinct()  # the same edge can win for both of its components
        )
        picked = M.checkpoint(picked)
        M.free(live)
        forest = M.swap(forest, forest.unionByName(picked.select("a", "b", "w")))
        comp = _contract(M, comp, picked.select("ca", "cb"))
        M.free(picked)
        # drop intra-component pairs early: keeps `und` shrinking
        ca2 = comp.select(F.col("id").alias("a"), F.col("comp").alias("_na"))
        cb2 = comp.select(F.col("id").alias("b"), F.col("comp").alias("_nb"))
        und = M.swap(
            und,
            und.join(ca2, "a").join(cb2, "b")
            .where(F.col("_na") != F.col("_nb"))
            .select("a", "b", "w"),
        )
    M.free(und)
    M.free(comp)
    return forest


def msf_total_weight(forest: DataFrame) -> float:
    return forest.agg(F.sum("w")).collect()[0][0] or 0.0
