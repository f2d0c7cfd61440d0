"""random_walks vs the pure-Python oracle, both hash families."""

import pytest

from fog_spark.operators.walks import random_walks
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_walks_match_oracle(spark, gname, hash_fn):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in random_walks(
            make_edges_df(spark, edges), walk_len=6, hash_fn=hash_fn
        ).collect()
    }
    want = GX.random_walks_oracle(edges, walk_len=6, hash_fn=hash_fn)
    assert got == want, (gname, hash_fn)


def test_walks_shape_and_absorption(spark):
    # chain5: 0->1->2->3->4; vertex 4 is dangling. Every walk from the 4
    # sources has exactly walk_len+1 steps and ends absorbed at 4.
    edges, n = GX.ALL_GRAPHS["chain5"]
    rows = random_walks(make_edges_df(spark, edges), walk_len=8).collect()
    assert len(rows) == 4 * 9  # 4 sources x (8 steps + start)
    final = {r["walk_id"]: r["vertex"] for r in rows if r["step"] == 8}
    assert set(final.values()) == {4}


def test_walks_deterministic_across_runs(spark):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, edges)
    a = sorted(map(tuple, random_walks(df, walk_len=5).collect()))
    b = sorted(map(tuple, random_walks(df, walk_len=5).collect()))
    assert a == b


def test_walks_per_vertex(spark):
    from fog_spark.operators.walks import random_walks
    from tests import graphs as GX
    from tests.conftest import make_edges_df

    edges, n = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, edges)
    rows = random_walks(df, walk_len=5, walks_per_vertex=3).collect()
    base = {r["walk_id"] for r in random_walks(df, walk_len=5).collect()}
    # 3x walks, ids = start*3 + j
    assert len(rows) == 3 * len(base) * 6
    starts = {r["walk_id"] // 3 for r in rows}
    assert starts == base
    # step 0 of every sibling walk is the shared start vertex
    for r in rows:
        if r["step"] == 0:
            assert r["vertex"] == r["walk_id"] // 3
    # sibling walks diverge somewhere (hash keys on walk_id)
    paths = {}
    for r in rows:
        paths.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    sib = [tuple(paths[w][s] for s in range(6)) for w in sorted(paths) if w // 3 == 0]
    assert len(set(sib)) > 1
