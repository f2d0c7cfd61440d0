"""Strongly connected components — FOG's multi-round forward/backward
label intersection (/root/reference/application/scc.hpp:17-216), re-imagined
as the standard parallel *coloring* algorithm (Orzan FW-BW coloring), which
maps cleanly onto DataFrame fixpoints:

Per outer round (the analog of scc.hpp's ``finalize -> ENGINE_CONTINUE``
re-entry, fog_engine.cpp:226-231), over the still-unassigned subgraph:

1. **trim** — vertices with in-degree 0 or out-degree 0 are singleton
   SCCs; peel repeatedly (FOG trims degree-0 vertices once in round 0,
   scc.hpp:41-97; repeated trimming just converges faster).
2. **color** — min-label forward propagation to fixpoint:
   ``color(v) = min(v, min_{u->v} color(u))`` — each vertex learns the
   smallest vertex that reaches it (the fwd pass, scc.hpp:100-116).
3. **mark** — backward reachability from each root (``color(r)==r``)
   restricted to edges whose endpoints share a color (the bwd pass +
   intersection, scc.hpp:118-142). Marked vertices of color r form the
   SCC containing r; its label is the min member id (so labels are
   schedule-independent and exactly testable).
4. assign + remove, repeat until the subgraph is empty.

Every inner iteration is one scatter/gather plan; per-iteration state is
materialized and reclaimed through :class:`Materializer` (double-buffered
— leaked checkpoint blocks were measured to cost 5x throughput via
eviction/recompute). Web graphs finish in few outer rounds: one giant
SCC + trim-able tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import Materializer


def _min_color_fixpoint(
    M: Materializer, verts: DataFrame, edges: DataFrame, max_iters: int
) -> DataFrame:
    """(id, color): min vertex id that reaches id over directed edges.

    Each iteration does one propagation hop plus pointer doubling —
    ``color(v) <- min(color(v), color(color(v)))`` is valid because
    "reaches" is transitive (if c reaches v and c' reaches c, c' reaches
    v) and color values are themselves vertex ids — so convergence takes
    O(log diameter) iterations, not O(diameter). Raises if the bound is
    exhausted with changes still occurring (a silent early return would
    shatter large-diameter SCCs into wrong components)."""
    color = M.checkpoint(verts.select("id", F.col("id").alias("color")))
    for _ in range(max_iters):
        msgs = (
            color.join(edges, color["id"] == edges["src"])
            .groupBy(edges["dst"].alias("mid"))
            .agg(F.min("color").alias("mcolor"))
        )
        hop = color.join(msgs, color["id"] == F.col("mid"), "left").select(
            "id",
            F.least("color", F.coalesce("mcolor", "color")).alias("color"),
            F.col("color").alias("_old"),
        )
        parent = hop.select(F.col("id").alias("pid"), F.col("color").alias("pcolor"))
        new = (
            hop.join(parent, hop["color"] == F.col("pid"), "left")
            .select(
                "id",
                F.least("color", F.coalesce("pcolor", "color")).alias("color"),
                (F.least("color", F.coalesce("pcolor", "color")) < F.col("_old")).alias("_chg"),
            )
        )
        new = M.swap(color, new)
        n_changed = new.where("_chg").count()
        color = M.adopt(new.drop("_chg"), new)
        if n_changed == 0:
            return color
    M.free(color)
    raise RuntimeError(
        f"scc min-color fixpoint did not converge in {max_iters} iterations"
    )


def scc(
    edges: DataFrame,
    max_rounds: int = 25,
    max_inner_iters: int = 200,
    round_walls: list | None = None,
) -> DataFrame:
    """(id, scc) for every vertex; scc = min vertex id of its strongly
    connected component. Self-loops are irrelevant to SCC membership and
    dropped up front (matching the TARGET engine's skip,
    /root/reference/fogsrc/cpu_thread.cpp:235-239). Pass a list as
    ``round_walls`` to collect per-round wall seconds (the bench's
    iteration-wall evidence)."""
    import time as _time

    M = Materializer(edges.sparkSession)
    e0 = G.normalize_edges(edges).select("src", "dst")
    e = M.checkpoint(e0.where(F.col("src") != F.col("dst")).distinct())
    # all vertices of the input — a vertex appearing only in a self-loop
    # is still a (singleton) SCC
    verts = M.checkpoint(G.vertex_ids(e0))
    assigned = verts.sparkSession.createDataFrame([], "id long, scc long")

    for _ in range(max_rounds):
        _t0 = _time.monotonic()

        def _lap():
            if round_walls is not None:
                round_walls.append(round(_time.monotonic() - _t0, 3))

        # ---- 1. trim: no in-edges or no out-edges => singleton SCC
        while True:
            srcs = e.select(F.col("src").alias("id")).distinct()
            dsts = e.select(F.col("dst").alias("id")).distinct()
            core = M.checkpoint(srcs.join(dsts, "id"))  # has in- AND out-edges
            trimmed = M.checkpoint(verts.join(core, "id", "left_anti"))
            if trimmed.isEmpty():
                M.free(core)
                M.free(trimmed)
                break
            assigned = M.swap(
                assigned, assigned.unionByName(trimmed.select("id", F.col("id").alias("scc")))
            )
            M.free(trimmed)
            M.free(verts)
            verts = core
            e = M.swap(
                e,
                e.join(verts.withColumnRenamed("id", "src"), "src").join(
                    verts.withColumnRenamed("id", "dst"), "dst"
                ).select("src", "dst"),
            )
        if verts.isEmpty():
            M.free(e)
            M.free(verts)
            _lap()
            return assigned

        # ---- 2. forward min-color fixpoint
        color = _min_color_fixpoint(M, verts, e, max_inner_iters)

        # ---- 3. backward pass = the SAME fixpoint on the REVERSED
        # same-color subgraph. Every colored edge joins same-color
        # endpoints, so paths stay within one color class; revcolor(v) is
        # then the min class member reachable FROM v, and v belongs to the
        # SCC of its class root r iff color(v) == revcolor(v) == r (all
        # class members have id >= r, so reaching r is the minimum). This
        # replaces hop-at-a-time backward BFS with an O(log diameter)
        # doubled fixpoint, and the SCC label is the color itself (r is
        # the min member) — no extra groupBy+join.
        csrc = color.select(F.col("id").alias("src"), F.col("color").alias("_cs"))
        cdst = color.select(F.col("id").alias("dst"), F.col("color").alias("_cd"))
        colored_edges = M.checkpoint(
            e.join(csrc, "src").join(cdst, "dst")
            .where(F.col("_cs") == F.col("_cd"))
            .select("src", "dst")
        )
        rev_edges = colored_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        revcolor = _min_color_fixpoint(M, verts, rev_edges, max_inner_iters)
        M.free(colored_edges)

        # ---- 4. members: forward color == backward color; assign + shrink
        found = M.checkpoint(
            color.join(
                revcolor.withColumnRenamed("color", "_rev"), "id"
            )
            .where(F.col("color") == F.col("_rev"))
            .select("id", F.col("color").alias("scc"))
        )
        M.free(revcolor)
        M.free(color)
        assigned = M.swap(assigned, assigned.unionByName(found))
        verts = M.swap(verts, verts.join(found, "id", "left_anti"))
        M.free(found)
        if verts.isEmpty():
            M.free(e)
            M.free(verts)
            _lap()
            return assigned
        e = M.swap(
            e,
            e.join(verts.withColumnRenamed("id", "src"), "src").join(
                verts.withColumnRenamed("id", "dst"), "dst"
            ).select("src", "dst"),
        )
        _lap()

    # bounded exit: fabricating singleton labels here could split a real
    # SCC — fail loudly instead (every round removes at least each class
    # root's SCC, so hitting this means max_rounds is genuinely too small)
    M.free(e)
    M.free(verts)
    raise RuntimeError(f"scc did not converge in {max_rounds} rounds")


def scc_sizes(labels: DataFrame) -> DataFrame:
    """(scc, size) — finalize analog (scc.hpp:184-205 counts components)."""
    return labels.groupBy("scc").agg(F.count("*").alias("size"))
