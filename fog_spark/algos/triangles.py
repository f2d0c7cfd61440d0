"""Triangle counting (north_rule N2 — future work in the reference,
/root/reference/TODO.list:16-21).

Undirected distinct-edge triangles, each counted once via canonical
orientation a<b<c: two shuffle joins over the deduped canonical edge set.
At web scale the first join's output (wedges) dominates — the canonical
a<b orientation already halves it, and the standard degree-ordering trick
(orient from lower- to higher-degree endpoint) is applied to bound wedge
counts at hub vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.graph import normalize_edges


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    e = normalize_edges(edges).select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


def triangles(edges: DataFrame, degree_order: bool = True) -> DataFrame:
    """(a, b, c) rows, one per triangle, a<b<c."""
    return triangles_of_canonical(_canonical_undirected(edges), degree_order)


def triangles_of_canonical(und: DataFrame, degree_order: bool = True) -> DataFrame:
    """Triangle enumeration over an already-canonical (a<b, distinct,
    loop-free) edge set — reused by the k-truss peel, which re-enumerates
    on a shrinking edge set each round."""
    if degree_order:
        # orient each edge from the lower-(degree, id) endpoint to the
        # higher one: every vertex's oriented out-degree is O(sqrt(m)),
        # so hub wedges never explode (standard node-iterator++).
        deg = (
            und.select(F.col("a").alias("v")).unionAll(und.select(F.col("b").alias("v")))
            .groupBy("v").agg(F.count("*").alias("d"))
        )
        da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
        db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
        ed = und.join(da, "a").join(db, "b")
        lower_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        oriented = ed.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
        w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("q1"))
        w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("q2"))
        wedges = w1.join(w2, "p").where(F.col("q1") < F.col("q2"))
        closed = wedges.join(
            und,
            (F.least("q1", "q2") == und["a"]) & (F.greatest("q1", "q2") == und["b"]),
            "left_semi",
        )
        return closed.select(
            F.least("p", "q1", "q2").alias("a"),
            F.expr("array_sort(array(p, q1, q2))[1]").alias("b"),
            F.greatest("p", "q1", "q2").alias("c"),
        )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    closed = wedges.join(
        und, (wedges["x"] == und["a"]) & (wedges["z"] == und["b"]), "left_semi"
    )
    return closed.select(F.col("x").alias("a"), F.col("y").alias("b"), F.col("z").alias("c"))


def triangle_count(edges: DataFrame, degree_order: bool = True) -> int:
    return triangles(edges, degree_order=degree_order).count()


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(id, degree, tri, lcc) per vertex of the canonical undirected
    graph: tri = triangles through the vertex, lcc = 2*tri/(d*(d-1)) —
    the local clustering coefficient (0.0 for degree <= 1). One extra
    explode + groupBy over the triangle rows; degrees reuse the canonical
    edge set."""
    und = _canonical_undirected(edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    per_v = (
        triangles(edges)
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("tri"))
    )
    d = F.col("degree").cast("double")
    tri = F.coalesce("tri", F.lit(0)).cast("long")
    return deg.join(per_v, "id", "left").select(
        "id",
        "degree",
        tri.alias("tri"),
        F.when(
            F.col("degree") >= 2, 2.0 * tri.cast("double") / (d * (d - 1.0))
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def triangle_delta(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """One-row crawl-to-crawl triangle-count delta WITHOUT a full
    recount: ``delta = triangle_count(new) - triangle_count(old)``
    computed from the edge delta only — triangles untouched by the
    delta cancel, so only triangles containing >= 1 added edge (counted
    in the NEW graph) and >= 1 removed edge (counted in the OLD graph)
    are ever enumerated. Completes the warm-refresh family
    (WarmStartPageRank, WarmStartCC, snapshots.edge_delta).

    Exactness: a triangle with k delta edges would be counted k times
    by naive per-edge common-neighbor counting, so the count of
    DISTINCT touched triangles is assembled by inclusion-exclusion
    (k - C(k,2) + C(k,3) = 1 for k in {1,2,3}):

      N1 = sum over delta edges of |common neighbors in G|
      N2 = wedges of TWO delta edges sharing a vertex, closed by a G edge
      N3 = triangles with all three edges in the delta
      touched = N1 - N2 + N3

    Scale shape: N1 joins the delta against the full adjacency by
    endpoint (delta-driven; output bounded by the delta endpoints'
    degrees — a hub endpoint costs its degree, the same class as one
    scatter); N2 is a self-join of the delta's incident-edge lists
    (bounded by the delta's per-vertex degree squared — deltas are
    sparse by construction; a full-graph rebuild should just recount);
    N3 enumerates triangles of the delta alone. Nothing touches the
    full graph's wedge space, which is what a recount pays.

    Returns (n_added, n_removed, tri_gained, tri_lost, delta) — pinned
    by tests against full-recount differences on fixture and seeded
    random graph pairs.

    The four shared frames (both canonical sets and both delta sides)
    are checkpointed ONCE up front: the function issues ~8 actions
    (two delta counts plus N1/N2/N3 per side), and without caching each
    action re-paid the canonicalization distinct-shuffles and the
    anti-joins from scratch — invisible at gate scale, real money on a
    crawl-sized delta. Blocks are reclaimed on exit via the
    Materializer (plain unpersist is a no-op for checkpoint-backed
    frames).
    """
    from fog_spark.plans.materialize import Materializer

    M = Materializer(edges_new.sparkSession)
    old_c = M.checkpoint(_canonical_undirected(edges_old))
    new_c = M.checkpoint(_canonical_undirected(edges_new))
    added = M.checkpoint(new_c.join(old_c, ["a", "b"], "left_anti"))
    removed = M.checkpoint(old_c.join(new_c, ["a", "b"], "left_anti"))

    def touched(s: DataFrame, g: DataFrame) -> int:
        # directed both ways for endpoint joins
        g2 = g.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
            g.select(F.col("b").alias("u"), F.col("a").alias("w"))
        )
        ga = g2.select(F.col("u").alias("a"), F.col("w"))
        gb = g2.select(F.col("u").alias("b"), F.col("w"))
        # N1: (delta edge, common neighbor) incidences; w == a or w == b
        # would need a self-loop, which canonical sets exclude
        n1 = s.join(ga, "a").join(gb, ["b", "w"]).count()
        # N2: two delta edges sharing vertex v closing over a G edge;
        # the shared vertex identifies the wedge, o1 < o2 dedupes the
        # unordered pair
        s2 = s.select(F.col("a").alias("v"), F.col("b").alias("o")).unionAll(
            s.select(F.col("b").alias("v"), F.col("a").alias("o"))
        )
        p1 = s2.select("v", F.col("o").alias("o1"))
        p2 = s2.select("v", F.col("o").alias("o2"))
        pairs = p1.join(p2, "v").where(F.col("o1") < F.col("o2"))
        n2 = pairs.join(
            g,
            (pairs["o1"] == g["a"]) & (pairs["o2"] == g["b"]),
            "left_semi",
        ).count()
        # N3: triangles entirely inside the delta
        n3 = triangles_of_canonical(s).count()
        return n1 - n2 + n3

    n_added, n_removed = added.count(), removed.count()
    gained = touched(added, new_c) if n_added else 0
    lost = touched(removed, old_c) if n_removed else 0
    for f in (added, removed, old_c, new_c):
        M.free(f)
    spark = edges_new.sparkSession
    return spark.createDataFrame(
        [(n_added, n_removed, gained, lost, gained - lost)],
        "n_added long, n_removed long, tri_gained long, tri_lost long, delta long",
    )
