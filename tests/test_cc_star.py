"""Star-contraction CC must produce the identical labeling (min vertex
id per weakly-connected component) as the hash-min engine, on every
fixture shape including skewed hubs and pathological chains."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from fog_spark.algos.cc_star import star_contraction_components
from tests import graphs as GX
from tests.conftest import make_edges_df


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


@pytest.mark.parametrize("name", sorted(GX.ALL_GRAPHS))
def test_matches_cc_oracle_on_fixtures(spark, name):
    edges, n = GX.ALL_GRAPHS[name]
    got = _labels(
        star_contraction_components(
            spark, make_edges_df(spark, edges), vertices=spark.range(n).select("id")
        )
    )
    assert got == dict(enumerate(GX.cc_oracle(edges, n)))


def test_matches_hash_min_engine(spark):
    """Both implementations on a multi-component random-ish graph with a
    planted hub and isolated vertices."""
    from fog_spark.algos import ConnectedComponents
    from fog_spark.plans.engine import ScatterGatherEngine

    n = 3000
    edges = [((7 * i + 3) % n, (11 * i + 5) % n) for i in range(0, n, 3)]
    edges += [(1, i) for i in range(2, 120)]  # hub
    edges += [(i, i + 1) for i in range(2000, 2600)]  # long chain
    e = make_edges_df(spark, edges)
    verts = spark.range(n).select("id")

    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    want = _labels(eng.run(ConnectedComponents(), e, vertices=verts).state)
    got = _labels(star_contraction_components(spark, e, vertices=verts))
    assert got == want


def test_long_chain_converges_in_log_rounds(spark):
    """A 600-vertex path needs ~600 hash-min iterations but must finish
    well inside the star-contraction round budget — the reason this
    variant exists."""
    edges = [(i, i + 1) for i in range(600)]
    got = _labels(
        star_contraction_components(
            spark, make_edges_df(spark, edges), max_rounds=25
        )
    )
    assert set(got.values()) == {0}
    assert len(got) == 601


def test_self_loops_and_empty(spark):
    got = _labels(
        star_contraction_components(
            spark,
            make_edges_df(spark, [(0, 0), (2, 2)]),
            vertices=spark.range(4).select("id"),
        )
    )
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
