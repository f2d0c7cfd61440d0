"""Every algorithm vs its pure-Python/NumPy oracle on every fixture graph
(FIXTURES.md F6 conventions: PR allclose 1e-6, CC/LPA/BFS exact)."""

import numpy as np
import pytest

from fog_spark.algos import (
    BFS,
    SSSP,
    ConnectedComponents,
    FogPageRank,
    LabelPropagation,
    StandardPageRank,
    spmv,
    triangle_count,
)
from fog_spark.plans.engine import ScatterGatherEngine
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


def _vertices(spark, n):
    return spark.range(n).select("id")


def _engine(spark):
    return ScatterGatherEngine(spark, checkpoint_dir=None)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_fog_pagerank_matches_reference_recurrence(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(
        FogPageRank(niters=10), make_edges_df(spark, edges), vertices=_vertices(spark, n)
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = GX.fog_pagerank_oracle(edges, n, iters=10)
    assert res.iterations == 10
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-6, (gname, v, got[v], want[v])


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_standard_pagerank_fixed_iters(spark, gname):
    """Exact state match vs oracle after a bounded iteration count (full
    convergence to 1e-6 is covered once in test_standard_pagerank_converges
    — at ~100 engine iterations it is too slow to repeat per graph)."""
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(
        StandardPageRank(tol=0.0),  # never converges early
        make_edges_df(spark, edges),
        max_iters=8,
        vertices=_vertices(spark, n),
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want, _ = GX.std_pagerank_oracle(edges, n, tol=0.0, max_iters=8)
    np.testing.assert_allclose([got[v] for v in range(n)], want, atol=1e-12)
    # probability mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_standard_pagerank_converges(spark):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    res = _engine(spark).run(
        StandardPageRank(tol=1e-6), make_edges_df(spark, edges), vertices=_vertices(spark, n)
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want, oracle_iters = GX.std_pagerank_oracle(edges, n, tol=1e-6)
    assert res.converged
    assert res.iterations == oracle_iters
    np.testing.assert_allclose([got[v] for v in range(n)], want, atol=1e-6)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_connected_components_exact(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(
        ConnectedComponents(), make_edges_df(spark, edges), vertices=_vertices(spark, n)
    )
    got = {r["id"]: r["component"] for r in res.state.collect()}
    want = GX.cc_oracle(edges, n)
    assert res.converged
    assert [got[v] for v in range(n)] == want


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_lpa_exact(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(
        LabelPropagation(max_iters=20),
        make_edges_df(spark, edges),
        vertices=_vertices(spark, n),
    )
    got = {r["id"]: r["label"] for r in res.state.collect()}
    want = GX.lpa_oracle(edges, n, max_iters=20)
    assert [got[v] for v in range(n)] == want


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_bfs_levels(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(
        BFS(root=0), make_edges_df(spark, edges), vertices=_vertices(spark, n)
    )
    got = {r["id"]: r["level"] for r in res.state.collect()}
    want = GX.bfs_oracle(edges, n, root=0)
    for v in range(n):
        if want[v] is None:
            assert got[v] >= (1 << 62)
        else:
            assert got[v] == want[v]


def test_bfs_bound_truncates_like_oracle(spark):
    """Eccentricity > bound: a 150-vertex directed path under
    max_iters=100 must reach exactly levels 0..100 and leave the tail
    unreached — the same truncation the gate oracle's `r.lvl < 100`
    recursion guard produces, so query and oracle agree on any graph."""
    n = 150
    edges = [(i, i + 1) for i in range(n - 1)]
    res = _engine(spark).run(
        BFS(root=0), make_edges_df(spark, edges),
        vertices=_vertices(spark, n), max_iters=100,
    )
    got = {r["id"]: r["level"] for r in res.state.collect()}
    assert not res.converged  # frontier still active at the bound
    for v in range(n):
        if v <= 100:
            assert got[v] == v
        else:
            assert got[v] >= (1 << 62)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_sssp_dists(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(
        SSSP(source=0), make_edges_df(spark, edges), vertices=_vertices(spark, n)
    )
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    want = GX.sssp_oracle(edges, n, source=0)
    for v in range(n):
        if want[v] == float("inf"):
            assert got[v] == float("inf")
        else:
            assert abs(got[v] - want[v]) < 1e-9


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_triangles(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    e = make_edges_df(spark, edges)
    want = GX.triangle_oracle(edges, n)
    assert triangle_count(e, degree_order=True) == want
    assert triangle_count(e, degree_order=False) == want


def test_clustering_coefficients(spark):
    """Per-vertex triangles + local clustering coefficient vs a brute
    Python oracle on the two_triangles fixture."""
    from itertools import combinations

    from fog_spark.algos.triangles import clustering_coefficients

    edges, n = GX.ALL_GRAPHS["two_triangles"]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    got = {
        r["id"]: (r["degree"], r["tri"], r["lcc"])
        for r in clustering_coefficients(make_edges_df(spark, edges)).collect()
    }
    assert got.keys() == nbrs.keys()
    for v, ns in nbrs.items():
        d = len(ns)
        tri = sum(1 for x, y in combinations(sorted(ns), 2) if (x, y) in und)
        lcc = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert got[v][0] == d
        assert got[v][1] == tri
        assert abs(got[v][2] - lcc) < 1e-12


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_spmv(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {r["id"]: r["y"] for r in spmv(make_edges_df(spark, edges)).collect()}
    want = GX.spmv_oracle(edges, n)
    assert set(got) == set(want)
    for v, y in want.items():
        assert abs(got[v] - y) < 1e-9


def test_fog_pagerank_on_generated_graph(spark):
    """End-to-end on the F2 link graph at n=200: html -> edges -> pagerank."""
    from fog_spark.functions.extract import edges_from_pages
    from fog_spark.sources.pages import edges_rows, generate_pages

    n = 200
    pages = generate_pages(spark, n)
    e = edges_from_pages(pages)
    res = _engine(spark).run(FogPageRank(niters=5), e, vertices=_vertices(spark, n))
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    want = GX.fog_pagerank_oracle([(s, d) for s, d, _ in edges_rows(n)], n, iters=5)
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-6


def test_weighted_pagerank_milli_match_oracle(spark):
    from fog_spark.algos.pagerank import WeightedPageRankMilli
    from fog_spark.hashing import pmod, xxhash64

    for gname in GX.ALL_GRAPHS:
        edges, n = GX.ALL_GRAPHS[gname]
        ew = [
            (s, d, 1.0 + pmod(xxhash64(int(s), int(d)), 9000) / 1000.0)
            for s, d in edges
        ]
        res = _engine(spark).run(
            WeightedPageRankMilli(niters=6), make_edges_df(spark, edges)
        )
        got = {
            r["id"]: r["rank_milli"]
            for r in res.state.select("id", "rank_milli").collect()
        }
        assert got == GX.weighted_pagerank_milli_oracle(ew, niters=6), gname
