"""HITS milli twin + neighbor sampling vs pure-Python oracles."""

import pytest

from fog_spark.algos.hits import hits_milli
from fog_spark.operators.sampling import sample_neighbors
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_hits_match_oracle(spark, gname):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: (r["auth_milli"], r["hub_milli"])
        for r in hits_milli(make_edges_df(spark, edges), iters=4).collect()
    }
    assert got == GX.hits_oracle(edges, iters=4), gname


def test_hits_hub_authority_structure(spark):
    # star: 0 -> 1..9 plus 1..9 -> 10: vertex 0 is the pure hub,
    # vertex 10 the dominant authority
    edges = [(0, i) for i in range(1, 10)] + [(i, 10) for i in range(1, 10)]
    got = {
        r["id"]: (r["auth_milli"], r["hub_milli"])
        for r in hits_milli(make_edges_df(spark, edges), iters=6).collect()
    }
    assert got[0][0] == 0  # nothing points at the hub
    assert got[10][0] == 1000  # max authority
    assert max(a for a, _ in got.values()) == 1000
    assert got == GX.hits_oracle(edges, iters=6)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_sample_neighbors_match_oracle(spark, gname, hash_fn):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        (r["src"], r["dst"])
        for r in sample_neighbors(
            make_edges_df(spark, edges), k=2, hash_fn=hash_fn
        ).collect()
    }
    assert got == GX.sample_neighbors_oracle(edges, k=2, hash_fn=hash_fn)


def test_sample_neighbors_hub_salted_two_phase(spark):
    """Planted 100k-out-degree hub: no task may sort the hub's full edge
    list (r04 verdict finding #2). Pins (a) the salted two-phase result
    equals the brute-force k-smallest-(H, dst) set, and (b) the phase-1
    window partition key (src, salt) splits the hub into groups far
    smaller than its degree."""
    from pyspark.sql import functions as F

    from fog_spark.hashing import pmod
    from fog_spark.operators.sampling import _SAMPLE_SALTS, _edge_hash

    D, K = 100_000, 5
    # src must be LONG: xxhash64 is width-sensitive and sample_neighbors
    # normalizes to long before hashing
    e = spark.range(D).select(
        F.lit(7).cast("long").alias("src"), (F.col("id") * 13 + 1).alias("dst")
    )
    got = {
        (r["src"], r["dst"]) for r in sample_neighbors(e, k=K).collect()
    }
    # brute-force oracle: k smallest (xxhash64(src,dst), dst) via Spark's
    # own hash values collected once
    hv = {
        r["dst"]: r["h"]
        for r in e.select("dst", F.xxhash64("src", "dst").alias("h")).collect()
    }
    want = {
        (7, d) for d in sorted(hv, key=lambda d: (hv[d], d))[:K]
    }
    assert got == want
    # phase-1 group sizes: max (src, salt) group is ~degree/salts, never
    # the full hub edge list
    sizes = (
        e.withColumn(
            "_salt", pmod(F.xxhash64(F.lit(-3), F.col("dst")), _SAMPLE_SALTS)
        )
        .groupBy("src", "_salt")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert sizes < 3 * D // _SAMPLE_SALTS, sizes


def test_sample_neighbors_caps_fanout(spark):
    edges, n = GX.ALL_GRAPHS["star_hub"]
    df = make_edges_df(spark, edges)
    got = sample_neighbors(df, k=3).groupBy("src").count().collect()
    deg = {}
    for s, d in set(edges):
        deg[s] = deg.get(s, 0) + 1
    for r in got:
        assert r["count"] == min(3, deg[r["src"]]), r
