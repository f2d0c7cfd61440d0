"""anchor_reachability vs the pure-Python bitmask oracle."""

import pytest

from fog_spark.algos.reach import anchor_reachability
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_anchor_reach_matches_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: (r["mask"], r["n_reach"])
        for r in anchor_reachability(
            make_edges_df(spark, edges), n_anchors=4, rounds=8
        ).collect()
    }
    want = GX.anchor_reach_oracle(edges, n, n_anchors=4, rounds=8)
    assert got == want, gname


def test_anchor_reach_truncated_bound(spark):
    # path: with rounds below the eccentricity both sides agree on the
    # identical partial masks
    path = [(i, i + 1) for i in range(12)]
    got = {
        r["id"]: (r["mask"], r["n_reach"])
        for r in anchor_reachability(
            make_edges_df(spark, path), n_anchors=6, rounds=3
        ).collect()
    }
    want = GX.anchor_reach_oracle(path, 13, n_anchors=6, rounds=3)
    assert got == want


def test_anchor_reach_all_anchors(spark):
    # chain with n_anchors = all vertices: vertex k is reached by
    # every upstream vertex within its distance
    edges, n = GX.ALL_GRAPHS["chain5"]
    got = {
        r["id"]: r["n_reach"]
        for r in anchor_reachability(
            make_edges_df(spark, edges), n_anchors=5, rounds=8
        ).collect()
    }
    assert got == {0: 1, 1: 2, 2: 3, 3: 4, 4: 5}
