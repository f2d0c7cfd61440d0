"""Borůvka MSF vs Kruskal oracle — exact edge sets (deterministic
hash-derived weights make the forest unique under the (w, a, b) order)."""

import random

import pytest

from fog_spark.algos import msf
from tests.conftest import make_edges_df
from tests import graphs as GX


def _run(spark, pairs):
    df = make_edges_df(spark, pairs)  # adds FIXTURES F2 hash weights
    got = {(r["a"], r["b"], r["w"]) for r in msf(df).collect()}
    want = GX.msf_oracle([(s, d, GX.weight(s, d)) for s, d in pairs])
    assert got == want


@pytest.mark.parametrize("gname", ["chain5", "two_triangles", "star_hub", "selfloop_pair"])
def test_msf_fixtures(spark, gname):
    edges, _ = GX.ALL_GRAPHS[gname]
    _run(spark, edges)


def test_msf_monotone_path(spark):
    # a monotone-weight path builds the longest contraction chains —
    # exercises the pointer-doubling in _contract
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(
        [(s, d, float(s)) for s, d in edges], "src long, dst long, weight double"
    )
    got = {(r["a"], r["b"], r["w"]) for r in msf(df).collect()}
    want = GX.msf_oracle([(s, d, float(s)) for s, d in edges])
    assert got == want


@pytest.mark.parametrize("seed", [3, 99])
def test_msf_random(spark, seed):
    rng = random.Random(seed)
    n = 50
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    _run(spark, pairs)
