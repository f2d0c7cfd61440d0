"""HITS milli twin + neighbor sampling vs pure-Python oracles."""

import pytest

from fog_spark.algos.hits import hits_milli
from fog_spark.operators.sampling import sample_neighbors
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_hits_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: (r["auth_milli"], r["hub_milli"])
        for r in hits_milli(make_edges_df(spark, edges), iters=4).collect()
    }
    assert got == GX.hits_oracle(edges, iters=4), gname


def test_hits_hub_authority_structure(spark):
    # star: 0 -> 1..9 plus 1..9 -> 10: vertex 0 is the pure hub,
    # vertex 10 the dominant authority
    edges = [(0, i) for i in range(1, 10)] + [(i, 10) for i in range(1, 10)]
    got = {
        r["id"]: (r["auth_milli"], r["hub_milli"])
        for r in hits_milli(make_edges_df(spark, edges), iters=6).collect()
    }
    assert got[0][0] == 0  # nothing points at the hub
    assert got[10][0] == 1000  # max authority
    assert max(a for a, _ in got.values()) == 1000
    assert got == GX.hits_oracle(edges, iters=6)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_sample_neighbors_match_oracle(spark, gname, hash_fn):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        (r["src"], r["dst"])
        for r in sample_neighbors(
            make_edges_df(spark, edges), k=2, hash_fn=hash_fn
        ).collect()
    }
    assert got == GX.sample_neighbors_oracle(edges, k=2, hash_fn=hash_fn)


def test_sample_neighbors_caps_fanout(spark):
    edges, n = GX.ALL_GRAPHS["star_hub"]
    df = make_edges_df(spark, edges)
    got = sample_neighbors(df, k=3).groupBy("src").count().collect()
    deg = {}
    for s, d in set(edges):
        deg[s] = deg.get(s, 0) + 1
    for r in got:
        assert r["count"] == min(3, deg[r["src"]]), r
