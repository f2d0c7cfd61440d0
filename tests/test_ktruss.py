"""k-truss peel vs the pure-Python oracle + planted-structure checks."""

import pytest

from fog_spark.algos.ktruss import k_truss
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)

# K4 on {0..3} with a pendant triangle {3,4,5} and a tail 5->6
K4_TAIL = (
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    + [(3, 4), (4, 5), (3, 5), (5, 6)]
)


def test_ktruss_rejects_small_k(spark):
    with pytest.raises(ValueError):
        k_truss(make_edges_df(spark, K4_TAIL), k=2)


@pytest.mark.parametrize("k", [3, 4])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_ktruss_match_oracle(spark, gname, k):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        (r["a"], r["b"])
        for r in k_truss(make_edges_df(spark, edges), k=k).collect()
    }
    assert got == GX.ktruss_oracle(edges, k=k), (gname, k)


def test_ktruss_planted_structure(spark):
    df = make_edges_df(spark, K4_TAIL)
    # 4-truss: only the K4 survives (the pendant triangle's edges have
    # support 1 and peel away, taking the tail's nothing with them)
    got4 = {(r["a"], r["b"]) for r in k_truss(df, k=4).collect()}
    assert got4 == {(a, b) for a in range(4) for b in range(a + 1, 4)}
    # 3-truss: K4 plus the pendant triangle, tail edge gone
    got3 = {(r["a"], r["b"]) for r in k_truss(df, k=3).collect()}
    assert got3 == got4 | {(3, 4), (4, 5), (3, 5)}
    assert got3 == GX.ktruss_oracle(K4_TAIL, k=3)
