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


def _py_coreness(pairs):
    # exact peeling (Batagelj-Zaversnik, O(n^2) toy version)
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set())
        adj.setdefault(d, set())
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    core, k = {}, 0
    live = set(adj)
    while live:
        v = min(live, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        live.discard(v)
        for u in adj[v]:
            if u in live:
                deg[u] -= 1
    return core


@pytest.mark.parametrize("gname", ["chain5", "two_triangles", "star_hub", "selfloop_pair"])
def test_coreness_matches_peel_oracle(spark, gname):
    from fog_spark.algos.kcore import coreness

    pairs, _ = GX.ALL_GRAPHS[gname]
    got = {r["id"]: r["core"] for r in coreness(make_edges_df(spark, pairs)).collect()}
    assert got == _py_coreness(pairs)


def test_coreness_consistent_with_kcore(spark):
    from fog_spark.algos.kcore import coreness, k_core

    pairs, _ = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, pairs)
    core = {r["id"]: r["core"] for r in coreness(df).collect()}
    for k in (1, 2):
        in_kcore = {r["id"] for r in k_core(df, k=k).collect()}
        assert in_kcore == {v for v, c in core.items() if c >= k}


def test_coreness_larger_random_graph(spark):
    import random

    rng = random.Random(7)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(400)})
    from fog_spark.algos.kcore import coreness

    got = {r["id"]: r["core"] for r in coreness(make_edges_df(spark, pairs)).collect()}
    assert got == _py_coreness(pairs)


def _py_trustrank(pairs, seeds, niters):
    # exact integer recurrence replay (self-loops kept, multi-edges kept)
    from collections import defaultdict

    outs = defaultdict(list)
    verts = set()
    for s, d in pairs:
        outs[s].append(d)
        verts.update((s, d))
    k = len(seeds)
    rank = {v: (1_000_000 // k if v in seeds else 0) for v in verts}
    for _ in range(niters):
        inc = defaultdict(int)
        for u, ds in outs.items():
            c = (850 * rank[u]) // (1000 * len(ds))
            for d in ds:
                inc[d] += c
        rank = {
            v: inc.get(v, 0) + (150_000 // k if v in seeds else 0)
            for v in verts
        }
    return rank


def test_trustrank_single_seed_equals_ppr(spark):
    from fog_spark.algos.pagerank import PPRMilli, TrustRankMilli

    pairs, _ = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, pairs)
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    a = {r["id"]: r["rank_milli"] for r in eng.run(PPRMilli(seed=0, niters=6), df).state.collect()}
    b = {r["id"]: r["rank_milli"] for r in eng.run(TrustRankMilli(seeds=[0], niters=6), df).state.collect()}
    assert a == b


@pytest.mark.parametrize("gname,seeds", [("two_triangles", [0, 4]), ("star_hub", [1, 2, 3]), ("chain5", [0])])
def test_trustrank_matches_exact_recurrence(spark, gname, seeds):
    from fog_spark.algos.pagerank import TrustRankMilli

    pairs, _ = GX.ALL_GRAPHS[gname]
    df = make_edges_df(spark, pairs)
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    got = {r["id"]: r["rank_milli"] for r in eng.run(TrustRankMilli(seeds=seeds, niters=5), df).state.collect()}
    assert got == _py_trustrank(pairs, set(seeds), 5)


def test_trustrank_unreachable_zero(spark):
    from fog_spark.algos.pagerank import TrustRankMilli

    # two disjoint edges; seed side 0-1, the 2-3 side must score 0
    df = make_edges_df(spark, [(0, 1), (2, 3)])
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    got = {r["id"]: r["rank_milli"] for r in eng.run(TrustRankMilli(seeds=[0], niters=4), df).state.collect()}
    assert got[2] == 0 and got[3] == 0 and got[1] > 0

    with pytest.raises(ValueError):
        TrustRankMilli(seeds=[])


def test_trustrank_duplicate_seeds_deduped(spark):
    from fog_spark.algos.pagerank import TrustRankMilli

    pairs, _ = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, pairs)
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    a = {r["id"]: r["rank_milli"] for r in eng.run(TrustRankMilli(seeds=[0, 4], niters=4), df).state.collect()}
    b = {r["id"]: r["rank_milli"] for r in eng.run(TrustRankMilli(seeds=[0, 4, 0, 4], niters=4), df).state.collect()}
    assert a == b


def test_coreness_hub_histogram_is_tiny(spark):
    """Planted 100k-degree star hub whose leaves all have degree 1: the
    per-round h-index window now runs over the (dst, est) HISTOGRAM, so
    the hub's window input is the count of DISTINCT neighbor estimates
    (here ~1-2 rows), not its 100k edge rows (r04 verdict finding #2).
    Pins both the histogram bound and the exact coreness values."""
    from pyspark.sql import functions as F

    from fog_spark.algos.kcore import coreness
    from fog_spark import graph as G

    D = 100_000
    e = spark.range(D).select(
        F.lit(0).cast("long").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = {r["id"]: r["core"] for r in coreness(e).collect()}
    assert got[0] == 1 and set(got.values()) == {1}
    assert len(got) == D + 1
    # replay round 1's histogram: degree estimates are D for the hub and
    # 1 for every leaf, so the hub's histogram has exactly ONE row
    sym = G.symmetrize(e)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core"))
    msgs = sym.join(deg, sym["src"] == deg["id"]).select(
        "dst", F.col("core").alias("nc")
    )
    hub_hist_rows = (
        msgs.groupBy("dst", "nc").count().where(F.col("dst") == 0).count()
    )
    assert hub_hist_rows == 1
