"""Modularity scoring + ego-network extraction vs pure-Python oracles."""

import pytest

from fog_spark.algos.modularity import modularity_plus1_milli, modularity_terms
from fog_spark.algos.msbfs import ego_network
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_modularity_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    # a deterministic non-trivial labeling: parity of the id
    verts = sorted({v for e in edges for v in e})
    labels = {v: v % 2 for v in verts}
    lab_df = spark.createDataFrame(
        [(v, l) for v, l in labels.items()], "id long, label long"
    )
    want = GX.modularity_oracle(edges, labels)
    got = modularity_plus1_milli(make_edges_df(spark, edges), lab_df).collect()
    if want is None:
        assert got == []
    else:
        assert (got[0]["q_plus1_milli"], got[0]["m_edges"]) == want, gname


def test_modularity_perfect_split(spark):
    # two disjoint triangles labeled by component: the best 2-community
    # split; Q = 2 * (3/6 - (6/12)^2) = 1/2 -> q_plus1_milli = 1500
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    labs = spark.createDataFrame(
        [(v, v // 3) for v in range(6)], "id long, label long"
    )
    got = modularity_plus1_milli(make_edges_df(spark, edges), labs).collect()[0]
    assert (got["q_plus1_milli"], got["m_edges"]) == (1500, 6)
    terms = {
        r["label"]: (r["e_c"], r["d_c"])
        for r in modularity_terms(make_edges_df(spark, edges), labs).collect()
    }
    assert terms == {0: (3, 6), 1: (3, 6)}


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_ego_network_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    seeds = sorted({s for s, _ in edges})[:2]
    got = {
        (r["src"], r["dst"])
        for r in ego_network(make_edges_df(spark, edges), seeds, k=2).collect()
    }
    assert got == GX.ego_network_oracle(edges, seeds, k=2), gname

def test_modularity_empty_simple_graph(spark):
    # self-loops only: the canonical simple projection is empty (m = 0),
    # modularity is undefined — must return an empty frame, not an ANSI
    # division-by-zero error (ADVICE r02)
    edges = [(0, 0), (1, 1)]
    labs = spark.createDataFrame([(0, 0), (1, 1)], "id long, label long")
    assert modularity_plus1_milli(make_edges_df(spark, edges), labs).collect() == []
