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

Every inner iteration is one scatter/gather plan (join -> explode-free
direct edge join -> groupBy min); ``localCheckpoint`` truncates lineage.
Web graphs finish in few outer rounds: one giant SCC + trim-able tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _min_color_fixpoint(verts: DataFrame, edges: DataFrame, max_iters: int) -> DataFrame:
    """(id, color): min vertex id that reaches id over directed edges."""
    color = _ckpt(verts.select("id", F.col("id").alias("color")))
    for _ in range(max_iters):
        msgs = (
            color.join(edges, color["id"] == edges["src"])
            .groupBy(edges["dst"].alias("mid"))
            .agg(F.min("color").alias("mcolor"))
        )
        new = (
            color.join(msgs, color["id"] == F.col("mid"), "left")
            .select(
                "id",
                F.least("color", F.coalesce("mcolor", "color")).alias("color"),
                (F.coalesce("mcolor", F.lit(1 << 62)) < F.col("color")).alias("_chg"),
            )
        )
        new = _ckpt(new)
        n_changed = new.where("_chg").count()
        color = new.drop("_chg")
        if n_changed == 0:
            break
    return color


def _backward_mark(
    roots: DataFrame, colored_edges: DataFrame, max_iters: int
) -> DataFrame:
    """(id, color) of every vertex backward-reachable from its color's
    root over same-color edges (roots included)."""
    marked = _ckpt(roots)
    frontier = marked
    for _ in range(max_iters):
        step = (
            frontier.join(colored_edges, frontier["id"] == colored_edges["dst"])
            .select(colored_edges["src"].alias("id"), frontier["color"])
            .distinct()
        )
        new = _ckpt(step.join(marked, "id", "left_anti"))
        if new.isEmpty():
            break
        marked = _ckpt(marked.unionByName(new))
        frontier = new
    return marked


def scc(
    edges: DataFrame,
    max_rounds: int = 25,
    max_inner_iters: int = 200,
) -> DataFrame:
    """(id, scc) for every vertex; scc = min vertex id of its strongly
    connected component. Self-loops are irrelevant to SCC membership and
    dropped up front (matching the TARGET engine's skip,
    /root/reference/fogsrc/cpu_thread.cpp:235-239)."""
    e0 = G.normalize_edges(edges).select("src", "dst")
    e = _ckpt(e0.where(F.col("src") != F.col("dst")).distinct())
    # all vertices of the input — a vertex appearing only in a self-loop
    # is still a (singleton) SCC
    verts = _ckpt(G.vertex_ids(e0))
    assigned = verts.sparkSession.createDataFrame([], "id long, scc long")

    for _ in range(max_rounds):
        # ---- 1. trim: no in-edges or no out-edges => singleton SCC
        while True:
            srcs = e.select(F.col("src").alias("id")).distinct()
            dsts = e.select(F.col("dst").alias("id")).distinct()
            core = _ckpt(srcs.join(dsts, "id"))  # has both in- and out-edges
            trimmed = _ckpt(verts.join(core, "id", "left_anti"))
            if trimmed.isEmpty():
                break
            assigned = _ckpt(
                assigned.unionByName(trimmed.select("id", F.col("id").alias("scc")))
            )
            verts = core
            e = _ckpt(
                e.join(verts.withColumnRenamed("id", "src"), "src").join(
                    verts.withColumnRenamed("id", "dst"), "dst"
                ).select("src", "dst")
            )
        if verts.isEmpty():
            return assigned

        # ---- 2. forward min-color fixpoint
        color = _min_color_fixpoint(verts, e, max_inner_iters)

        # ---- 3. backward mark from roots within color classes
        csrc = color.select(F.col("id").alias("src"), F.col("color").alias("_cs"))
        cdst = color.select(F.col("id").alias("dst"), F.col("color").alias("_cd"))
        colored_edges = _ckpt(
            e.join(csrc, "src").join(cdst, "dst")
            .where(F.col("_cs") == F.col("_cd"))
            .select("src", "dst")
        )
        roots = color.where(F.col("id") == F.col("color"))
        members = _backward_mark(roots, colored_edges, max_inner_iters)

        # ---- 4. label = min member id per color class; assign + shrink
        labels = members.groupBy("color").agg(F.min("id").alias("scc"))
        found = _ckpt(members.join(labels, "color").select("id", "scc"))
        assigned = _ckpt(assigned.unionByName(found))
        verts = _ckpt(verts.join(found, "id", "left_anti"))
        if verts.isEmpty():
            return assigned
        e = _ckpt(
            e.join(verts.withColumnRenamed("id", "src"), "src").join(
                verts.withColumnRenamed("id", "dst"), "dst"
            ).select("src", "dst")
        )

    # bounded exit: whatever remains unassigned keeps its own id
    return assigned.unionByName(verts.select("id", F.col("id").alias("scc")))


def scc_sizes(labels: DataFrame) -> DataFrame:
    """(scc, size) — finalize analog (scc.hpp:184-205 counts components)."""
    return labels.groupBy("scc").agg(F.count("*").alias("size"))
