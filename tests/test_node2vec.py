"""node2vec_walks vs the pure-Python oracle, both hash families."""

import pytest

from fog_spark.operators.node2vec import _ratios, node2vec_walks
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


def test_ratios_exact():
    # p=4, q=1/4: alpha in {1/4, 1, 4}, alpha_max=4
    assert _ratios(4, 0.25) == ((1, 16), (1, 4), (1, 1))
    # p=q=1: uniform, every class accepts at trial 1
    assert _ratios(1, 1) == ((1, 1), (1, 1), (1, 1))
    with pytest.raises(ValueError):
        _ratios(0, 1)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_node2vec_match_oracle(spark, gname, hash_fn):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in node2vec_walks(
            make_edges_df(spark, edges), walk_len=5, p=4, q=0.25, hash_fn=hash_fn
        ).collect()
    }
    want = GX.node2vec_oracle(edges, walk_len=5, p=4, q=0.25, hash_fn=hash_fn)
    assert got == want, (gname, hash_fn)


def test_node2vec_uniform_pq_matches_oracle(spark):
    # p=q=1 degenerates to uniform: trial 1 always accepts
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in node2vec_walks(
            make_edges_df(spark, edges), walk_len=4, p=1, q=1, hash_fn="md5"
        ).collect()
    }
    assert got == GX.node2vec_oracle(edges, walk_len=4, p=1, q=1, hash_fn="md5")


def test_node2vec_absorption_and_shape(spark):
    edges, n = GX.ALL_GRAPHS["chain5"]
    rows = node2vec_walks(
        make_edges_df(spark, edges), walk_len=8, p=2, q=0.5
    ).collect()
    assert len(rows) == 4 * 9
    final = {r["walk_id"]: r["vertex"] for r in rows if r["step"] == 8}
    assert set(final.values()) == {4}


def test_node2vec_deterministic_across_partitioning(spark):
    edges, n = GX.ALL_GRAPHS["star_hub"]
    df = make_edges_df(spark, edges)
    a = sorted(map(tuple, node2vec_walks(df, walk_len=5, p=4, q=0.25).collect()))
    b = sorted(
        map(
            tuple,
            node2vec_walks(df.repartition(7), walk_len=5, p=4, q=0.25).collect(),
        )
    )
    assert a == b


def test_node2vec_walks_per_vertex(spark):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, edges)
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in node2vec_walks(
            df, walk_len=4, p=4, q=0.25, walks_per_vertex=3, hash_fn="md5"
        ).collect()
    }
    want = GX.node2vec_oracle(
        edges, walk_len=4, p=4, q=0.25, walks_per_vertex=3, hash_fn="md5"
    )
    assert got == want
    # sibling walks from one start must diverge somewhere on this graph
    starts = {w // 3 for (w, _) in got}
    assert any(
        any(
            got[(s * 3 + i, t)] != got[(s * 3 + j, t)]
            for t in range(5)
            for i in range(3)
            for j in range(i + 1, 3)
        )
        for s in starts
    )


def test_ratios_reject_int64_overflow():
    # limit_denominator bounds P and Q, not the reduced ratio: p = 10^9,
    # q = 1 gives ret = 1/10^9 whose u32 * den product would overflow
    # int64 under ANSI mode — must raise, not silently corrupt (ADVICE r02)
    with pytest.raises(ValueError, match="10\\^6"):
        _ratios(10**9, 1)
    with pytest.raises(ValueError, match="10\\^6"):
        _ratios(1, 10**9)
    # boundary: 10^3 stays exact and accepted
    ret, nb, far = _ratios(1000, 1)
    assert ret == (1, 1000)
