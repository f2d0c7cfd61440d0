"""Bow-tie decomposition (Broder et al. 2000) + SetBFS vs oracles."""

import pytest

from fog_spark.algos.bowtie import bowtie, bowtie_census
from fog_spark.algos.traversal import UNREACHED_LEVEL, SetBFS
from fog_spark.plans.engine import ScatterGatherEngine
from tests.conftest import make_edges_df
from tests import graphs as GX

# Hand-built bow-tie: CORE {0,1}; 9 -> 2 -> 0 (IN); 1 -> 3 -> 4 (OUT);
# 2 -> 5 (tendril off IN); 6 -> 3 (tendril into OUT); 2 -> 7 -> 3
# (tube); 8 -> 10 (disconnected pair).
BOWTIE_EDGES = [
    (0, 1), (1, 0),
    (9, 2), (2, 0),
    (1, 3), (3, 4),
    (2, 5),
    (6, 3),
    (2, 7), (7, 3),
    (8, 10),
]
BOWTIE_N = 11

WANT = {
    0: "CORE", 1: "CORE",
    2: "IN", 9: "IN",
    3: "OUT", 4: "OUT",
    5: "TENDRIL_IN",
    6: "TENDRIL_OUT",
    7: "TUBE",
    8: "DISC", 10: "DISC",
}


def _engine(spark):
    return ScatterGatherEngine(spark, checkpoint_dir=None)


def test_bowtie_hand_built_regions(spark):
    got = {
        r["id"]: r["region"]
        for r in bowtie(make_edges_df(spark, BOWTIE_EDGES)).collect()
    }
    assert got == WANT
    assert got == GX.bowtie_oracle(BOWTIE_EDGES, BOWTIE_N)


@pytest.mark.parametrize("gname", list(GX.ALL_GRAPHS))
def test_bowtie_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: r["region"]
        for r in bowtie(make_edges_df(spark, edges)).collect()
    }
    assert got == GX.bowtie_oracle(edges, n), gname


def test_bowtie_census_sums_to_vertex_count(spark):
    rows = bowtie_census(make_edges_df(spark, BOWTIE_EDGES)).collect()
    counts = {r["region"]: r["n_vertices"] for r in rows}
    assert sum(counts.values()) == BOWTIE_N
    assert counts["CORE"] == 2 and counts["DISC"] == 2


def test_set_bfs_levels_from_nearest_seed(spark):
    # chain 0 -> 1 -> 2 -> 3 -> 4 with seeds {0, 3}: levels 0,1,2,0,1
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    e = make_edges_df(spark, edges)
    seeds = spark.createDataFrame([(0,), (3,)], "id long")
    res = _engine(spark).run(SetBFS(seeds), e)
    got = {r["id"]: r["level"] for r in res.state.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 1}


def test_set_bfs_empty_seeds_all_unreached(spark):
    e = make_edges_df(spark, [(0, 1), (1, 2)])
    seeds = spark.createDataFrame([], "id long")
    res = _engine(spark).run(SetBFS(seeds), e)
    assert res.converged
    assert all(r["level"] == UNREACHED_LEVEL for r in res.state.collect())
