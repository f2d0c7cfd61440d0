"""PPRMilli and k_core vs pure-Python oracles (FIXTURES F3 graphs plus a
K4-with-tail core fixture)."""

import pytest

from fog_spark.algos import PPRMilli, k_core
from fog_spark.plans.engine import ScatterGatherEngine
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)

# K4 on {0,1,2,3} (a 3-core) with a tail 3-4-5 that peels away at k>=2
K4_TAIL = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (3, 4), (4, 5),
]


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_ppr_milli_exact(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    res = ScatterGatherEngine(spark, checkpoint_dir=None).run(
        PPRMilli(seed=0, niters=8),
        make_edges_df(spark, edges),
        vertices=spark.range(n).select("id"),
    )
    got = {r["id"]: r["rank_milli"] for r in res.state.collect()}
    want = GX.ppr_milli_oracle(edges, n, seed=0, iters=8)
    assert got == want, gname


def test_ppr_milli_mass_stays_near_seed(spark):
    # on the chain, rank decays strictly with distance from the seed
    edges, n = GX.ALL_GRAPHS["chain5"]
    res = ScatterGatherEngine(spark, checkpoint_dir=None).run(
        PPRMilli(seed=0, niters=8),
        make_edges_df(spark, edges),
        vertices=spark.range(n).select("id"),
    )
    got = {r["id"]: r["rank_milli"] for r in res.state.collect()}
    ranks = [got[v] for v in range(n)]
    assert all(a > b for a, b in zip(ranks, ranks[1:]))
    assert all(r > 0 for r in ranks)


def test_ppr_milli_unreachable_is_zero(spark):
    # two_triangles: {3,4,5} and isolated 6 are unreachable from seed 0
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    res = ScatterGatherEngine(spark, checkpoint_dir=None).run(
        PPRMilli(seed=0, niters=8),
        make_edges_df(spark, edges),
        vertices=spark.range(n).select("id"),
    )
    got = {r["id"]: r["rank_milli"] for r in res.state.collect()}
    assert got[3] == got[4] == got[5] == got[6] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("gname", GRAPH_IDS + ["k4_tail"])
def test_kcore_matches_oracle(spark, gname, k):
    if gname == "k4_tail":
        edges, n = K4_TAIL, 6
    else:
        edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: r["degree"]
        for r in k_core(make_edges_df(spark, edges), k=k, max_rounds=16).collect()
    }
    want = GX.kcore_oracle(edges, n, k=k, max_rounds=16)
    assert got == want, (gname, k)


def test_kcore_k4_tail_structure(spark):
    # the 3-core of K4+tail is exactly the K4; the tail peels off
    got = {
        r["id"]: r["degree"]
        for r in k_core(make_edges_df(spark, K4_TAIL), k=3, max_rounds=16).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_truncated_bound_matches_oracle(spark):
    # a long path peels one vertex pair of ends per round: with the bound
    # BELOW the peel depth both sides must agree on the identical partial
    # result (the cross-engine contract for bounded queries)
    path = [(i, i + 1) for i in range(20)]
    got = {
        r["id"]: r["degree"]
        for r in k_core(make_edges_df(spark, path), k=2, max_rounds=3).collect()
    }
    want = GX.kcore_oracle(path, 21, k=2, max_rounds=3)
    assert got == want
