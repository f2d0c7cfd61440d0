"""Katz centrality milli twin vs a pure-Python replay on the fixture
graphs, plus the hub-vs-pagerank structural property."""

import pytest

from fog_spark.algos.katz import KatzMilli
from fog_spark.plans.engine import ScatterGatherEngine
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


def _engine(spark):
    return ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)


def katz_oracle(edges, alpha_milli=100, iters=8):
    verts = sorted({v for e in edges for v in e})
    x = {v: 0 for v in verts}
    for _ in range(iters):
        nxt = {v: 0 for v in verts}
        for s, d in edges:
            nxt[d] += (alpha_milli * (x[s] + 1000)) // 1000
        x = nxt
    return x


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_katz_matches_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = _engine(spark).run(KatzMilli(alpha_milli=100, niters=8),
                             make_edges_df(spark, edges))
    got = {r["id"]: r["katz_milli"] for r in res.state.collect()}
    assert got == katz_oracle(edges), gname


def test_katz_does_not_degree_normalize(spark):
    # one hub linking to a, plus a 1-in-degree chain page linking to b:
    # Katz gives a and b the SAME length-1 credit (no out-degree split),
    # which is exactly how it differs from PageRank's contribution model
    hub_out = [(0, i) for i in range(1, 6)]  # hub 0 -> 1..5 (incl a=1)
    edges = hub_out + [(6, 7)]  # chain page 6 -> b=7
    res = _engine(spark).run(KatzMilli(alpha_milli=100, niters=4),
                             make_edges_df(spark, edges))
    got = {r["id"]: r["katz_milli"] for r in res.state.collect()}
    assert got[1] == got[7] != 0


def test_katz_bad_alpha(spark):
    with pytest.raises(ValueError):
        KatzMilli(alpha_milli=0)
    with pytest.raises(ValueError):
        KatzMilli(alpha_milli=1000)
