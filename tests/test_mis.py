"""Luby MIS vs the pure-Python oracle + set-property checks."""

import pytest

from fog_spark.algos.mis import maximal_independent_set
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_mis_match_oracle(spark, gname, hash_fn):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: r["in_mis"]
        for r in maximal_independent_set(
            make_edges_df(spark, edges), hash_fn=hash_fn
        ).collect()
    }
    assert got == GX.mis_oracle(edges, hash_fn=hash_fn), (gname, hash_fn)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_mis_is_independent_and_maximal(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: r["in_mis"]
        for r in maximal_independent_set(make_edges_df(spark, edges)).collect()
    }
    assert None not in got.values(), "undecided at the round bound"
    mis = {v for v, s in got.items() if s}
    nbrs = {}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    # independent: no two MIS vertices adjacent
    assert not any(u in mis and v in mis for u in nbrs for v in nbrs[u])
    # maximal: every non-MIS vertex has an MIS neighbor
    for v, s in got.items():
        if not s:
            assert mis & nbrs.get(v, set()), v


def test_mis_deterministic_across_partitioning(spark):
    edges, n = GX.ALL_GRAPHS["star_hub"]
    df = make_edges_df(spark, edges)
    a = sorted(map(tuple, maximal_independent_set(df).collect()))
    b = sorted(map(tuple, maximal_independent_set(df.repartition(6)).collect()))
    assert a == b
