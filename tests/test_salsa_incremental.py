"""SALSA milli twin vs pure-Python oracle + warm-start (incremental)
PageRank: same fixpoint as cold start, in fewer iterations."""

import numpy as np
import pytest

from fog_spark.algos.pagerank import StandardPageRank, WarmStartPageRank
from fog_spark.algos.salsa import salsa_milli
from fog_spark.plans.engine import ScatterGatherEngine
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


def _vertices(spark, n):
    return spark.range(n).select("id")


def _engine(spark):
    return ScatterGatherEngine(spark, checkpoint_dir=None)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_salsa_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: (r["salsa_auth_milli"], r["salsa_hub_milli"])
        for r in salsa_milli(make_edges_df(spark, edges), iters=4).collect()
    }
    assert got == GX.salsa_oracle(edges, iters=4), gname


def test_salsa_damps_tight_community_vs_hits():
    # two communities: a dense 4-clique (12 edges) and a single authority
    # with 5 distinct in-neighbors. HITS locks onto the clique (its raw
    # sums compound); SALSA normalizes per-edge by degree, so the
    # 5-in-neighbor authority stays competitive. Oracle-level structural
    # check (engine twins are pinned to these oracles above/elsewhere).
    clique = [(a, b) for a in range(4) for b in range(4) if a != b]
    spoke = [(i, 10) for i in range(4, 9)]
    edges = clique + spoke
    hits = GX.hits_oracle(edges, iters=8)
    salsa = GX.salsa_oracle(edges, iters=8)
    # HITS: the spoke authority is crushed relative to clique members
    assert hits[10][0] < max(hits[v][0] for v in range(4))
    # SALSA: the spoke authority is the global maximum
    assert salsa[10][0] == 1000
    assert salsa[10][0] > max(salsa[v][0] for v in range(4))


def test_salsa_rejects_bad_iters(spark):
    with pytest.raises(ValueError):
        salsa_milli(make_edges_df(spark, [(0, 1)]), iters=0)


def test_warm_start_same_fixpoint_fewer_iterations(spark):
    # base graph, converge cold; perturb a few edges; warm start from the
    # stale ranks must reach the NEW graph's fixpoint (unique for d<1)
    # in strictly fewer iterations than a cold start on the new graph.
    base, n = GX.ALL_GRAPHS["two_triangles"]
    delta = [(0, 5), (6, 1)]  # cross-community edges added
    new_edges = base + delta
    eng = _engine(spark)
    v = _vertices(spark, n)
    stale = eng.run(StandardPageRank(tol=1e-9), make_edges_df(spark, base), vertices=v)
    cold = eng.run(
        StandardPageRank(tol=1e-9), make_edges_df(spark, new_edges), vertices=v
    )
    warm = eng.run(
        WarmStartPageRank(stale.state.select("id", "rank"), tol=1e-9),
        make_edges_df(spark, new_edges),
        vertices=v,
    )
    assert warm.converged and cold.converged
    assert warm.iterations < cold.iterations
    got_w = {r["id"]: r["rank"] for r in warm.state.collect()}
    got_c = {r["id"]: r["rank"] for r in cold.state.collect()}
    np.testing.assert_allclose(
        [got_w[i] for i in range(n)], [got_c[i] for i in range(n)], atol=1e-7
    )
    # probability mass conserved through the warm init's renormalization
    assert abs(sum(got_w.values()) - 1.0) < 1e-9


def test_warm_start_handles_new_and_departed_vertices(spark):
    # previous ranks cover vertices {0..4}; new graph drops 4, adds 7:
    # new vertex starts at 1/N, departed vertex drops out, mass stays 1.
    base = GX.ALL_GRAPHS["chain5"][0]
    eng = _engine(spark)
    stale = eng.run(
        StandardPageRank(tol=1e-9), make_edges_df(spark, base),
        vertices=_vertices(spark, 5),
    )
    new_edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 7), (7, 0)]
    new_verts = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 7]], "id long")
    warm = eng.run(
        WarmStartPageRank(stale.state.select("id", "rank"), tol=1e-9),
        make_edges_df(spark, new_edges),
        vertices=new_verts,
    )
    cold = eng.run(
        StandardPageRank(tol=1e-9), make_edges_df(spark, new_edges),
        vertices=new_verts,
    )
    got_w = {r["id"]: r["rank"] for r in warm.state.collect()}
    got_c = {r["id"]: r["rank"] for r in cold.state.collect()}
    assert set(got_w) == {0, 1, 2, 3, 7}
    np.testing.assert_allclose(
        [got_w[i] for i in sorted(got_w)], [got_c[i] for i in sorted(got_c)],
        atol=1e-7,
    )
    assert abs(sum(got_w.values()) - 1.0) < 1e-9
