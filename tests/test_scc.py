"""SCC coloring algorithm vs iterative-Tarjan oracle — exact labels
(min member vid), fixtures + seeded random digraphs."""

import random

import pytest

from fog_spark.algos import scc, scc_sizes
from tests.conftest import make_edges_df
from tests import graphs as GX

# two 3-cycles bridged by a one-way edge, plus a 2-cycle and a dangling tail
CYCLES = [
    (0, 1), (1, 2), (2, 0),          # scc {0,1,2}
    (2, 3),                          # bridge (one-way)
    (3, 4), (4, 5), (5, 3),          # scc {3,4,5}
    (6, 7), (7, 6),                  # scc {6,7}
    (5, 8), (8, 9),                  # dag tail: singletons 8, 9
]


def _run(spark, edges, n):
    got = {r["id"]: r["scc"] for r in scc(make_edges_df(spark, edges, weighted=False)).collect()}
    want = GX.scc_oracle(edges, n)
    present = {v for e in edges for v in e}
    assert got == {v: want[v] for v in range(n) if v in present}


def test_scc_cycles(spark):
    _run(spark, CYCLES, 10)


@pytest.mark.parametrize("gname", ["chain5", "two_triangles", "selfloop_pair"])
def test_scc_fixtures(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    _run(spark, edges, n)


@pytest.mark.parametrize("seed", [7, 42])
def test_scc_random_digraph(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    _run(spark, edges, n)


def test_scc_sizes(spark):
    labels = scc(make_edges_df(spark, CYCLES, weighted=False))
    sizes = {r["scc"]: r["size"] for r in scc_sizes(labels).collect()}
    assert sizes == {0: 3, 3: 3, 6: 2, 8: 1, 9: 1}
