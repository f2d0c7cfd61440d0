"""Capped bipartite co-projection vs the pure-Python oracle."""

import pytest

from fog_spark.operators.projection import co_project
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_co_project_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in co_project(make_edges_df(spark, edges)).collect()
    }
    assert got == GX.co_project_oracle(edges), gname


def test_co_project_hub_cap(spark):
    # dst 100 is a stop-hub shared by everyone; with the cap at 3 it
    # must contribute nothing, leaving only the pair sharing dst 200
    edges = [(i, 100) for i in range(10)] + [(0, 200), (1, 200)]
    got = {
        (r["a"], r["b"]): r["shared"]
        for r in co_project(make_edges_df(spark, edges), max_dst_degree=3).collect()
    }
    assert got == {(0, 1): 1}
    assert got == GX.co_project_oracle(edges, max_dst_degree=3)
    with pytest.raises(ValueError):
        co_project(make_edges_df(spark, edges), max_dst_degree=1)
