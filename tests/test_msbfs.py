"""multi_source_bfs / harmonic_centrality_milli vs pure-Python oracles."""

import pytest

from fog_spark.algos.msbfs import harmonic_centrality_milli, multi_source_bfs
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_msbfs_matches_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    seeds = [0, 1]
    got = {
        (r["id"], r["seed"]): r["dist"]
        for r in multi_source_bfs(make_edges_df(spark, edges), seeds).collect()
    }
    want = GX.msbfs_oracle(edges, seeds)
    assert got == want, gname


def test_msbfs_truncated_bound(spark):
    # path longer than the bound: both sides stop at the same layer
    path = [(i, i + 1) for i in range(10)]
    got = {
        (r["id"], r["seed"]): r["dist"]
        for r in multi_source_bfs(make_edges_df(spark, path), [0], max_rounds=3).collect()
    }
    assert got == GX.msbfs_oracle(path, [0], max_rounds=3)
    assert max(got.values()) == 3


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_harmonic_matches_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    seeds = [0, 1, 2]
    got = {
        r["id"]: (r["harmonic_milli"], r["n_seeds_reaching"])
        for r in harmonic_centrality_milli(make_edges_df(spark, edges), seeds).collect()
    }
    want = GX.harmonic_milli_oracle(edges, seeds)
    assert got == want, gname


def test_spcount_match_oracle(spark):
    from fog_spark.algos.msbfs import shortest_path_counts

    for gname in GX.ALL_GRAPHS:
        edges, n = GX.ALL_GRAPHS[gname]
        seeds = sorted({s for s, _ in edges})[:3]
        got = {
            (r["id"], r["seed"]): (r["dist"], r["sigma"])
            for r in shortest_path_counts(
                make_edges_df(spark, edges), seeds, max_rounds=8
            ).collect()
        }
        assert got == GX.spcount_oracle(edges, seeds, max_rounds=8), gname


def test_spcount_diamond_multiplicity(spark):
    # diamond 0->{1,2}->3 plus 3->4: two shortest paths 0..3, so
    # sigma(3)=2 and sigma(4)=2; BFS dist unaffected
    from fog_spark.algos.msbfs import shortest_path_counts

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = {
        (r["id"], r["seed"]): (r["dist"], r["sigma"])
        for r in shortest_path_counts(
            make_edges_df(spark, edges), [0], max_rounds=8
        ).collect()
    }
    assert got[(3, 0)] == (2, 2)
    assert got[(4, 0)] == (3, 2)
    assert got[(0, 0)] == (0, 1)


def test_spcont_match_oracle(spark):
    from fog_spark.algos.msbfs import sp_continuations

    for gname in GX.ALL_GRAPHS:
        edges, n = GX.ALL_GRAPHS[gname]
        seeds = sorted({s for s, _ in edges})[:3]
        got = {
            (r["id"], r["seed"]): (r["dist"], r["sigma"], r["t_cont"])
            for r in sp_continuations(
                make_edges_df(spark, edges), seeds, max_rounds=8
            ).collect()
        }
        assert got == GX.spcont_oracle(edges, seeds, max_rounds=8), gname


def test_spcont_stress_diamond(spark):
    # diamond 0->{1,2}->3->4: sigma(3)=2, continuations from 0 count all
    # path endpoints below it: t(4)=1, t(3)=2, t(1)=t(2)=3, t(0)=7
    from fog_spark.algos.msbfs import sp_continuations

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = {
        r["id"]: (r["sigma"], r["t_cont"])
        for r in sp_continuations(
            make_edges_df(spark, edges), [0], max_rounds=8
        ).collect()
    }
    assert got == {0: (1, 7), 1: (1, 3), 2: (1, 3), 3: (2, 2), 4: (2, 1)}


def test_betweenness_match_oracle(spark):
    from fog_spark.algos.msbfs import betweenness_sampled

    for gname in GX.ALL_GRAPHS:
        edges, n = GX.ALL_GRAPHS[gname]
        seeds = sorted({s for s, _ in edges})[:3]
        got = {
            r["id"]: r["betweenness"]
            for r in betweenness_sampled(
                make_edges_df(spark, edges), seeds, max_rounds=8
            ).collect()
        }
        want = GX.betweenness_oracle(edges, seeds, max_rounds=8)
        for v, b in want.items():
            assert abs(got.get(v, 0.0) - b) < 1e-9, (gname, v, got.get(v), b)


def test_betweenness_path_graph(spark):
    # path 0->1->2->3 from seed 0: delta(1)=2 (pairs (0,2),(0,3)),
    # delta(2)=1, endpoints 0
    from fog_spark.algos.msbfs import betweenness_sampled

    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(
            make_edges_df(spark, [(0, 1), (1, 2), (2, 3)]), [0]
        ).collect()
    }
    assert got == {1: 2.0, 2: 1.0, 3: 0.0}
