"""Text edge-list / adj-list ingest (reference converter parity,
process_edgelist.cpp / process_adjlist.cpp — the SNAP text path)."""

import pytest
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.sources.edgelist import (
    read_adjlist,
    read_edgelist,
    with_hash_weights,
    write_adjlist,
    write_edgelist,
)
from tests.conftest import make_edges_df

EDGELIST_TXT = """\
# Directed graph: test fixture
# Nodes: 5 Edges: 6
0\t1
0 2
1 2
3   4
2\t0
4 3
"""

ADJLIST_TXT = """\
# src n dst...
0 3 1 2 4
1 0
2 2 0 3
# trailing comment
4 1 0
"""


@pytest.fixture()
def tmp_txt(tmp_path):
    def write(name, body):
        p = tmp_path / name
        p.write_text(body)
        return str(p)

    return write


def test_read_edgelist(spark, tmp_txt):
    path = tmp_txt("g.txt", EDGELIST_TXT)
    got = sorted(tuple(r) for r in read_edgelist(spark, path).collect())
    assert got == [(0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (4, 3)]


def test_read_edgelist_weighted(spark, tmp_txt):
    path = tmp_txt("gw.txt", "0 1 1.5\n1 2 2.25\n")
    got = sorted(tuple(r) for r in read_edgelist(spark, path, weighted=True).collect())
    assert got == [(0, 1, 1.5), (1, 2, 2.25)]


def test_read_adjlist(spark, tmp_txt):
    path = tmp_txt("adj.txt", ADJLIST_TXT)
    got = sorted(tuple(r) for r in read_adjlist(spark, path).collect())
    # src 1 has n_edges=0 -> no rows (process_adjlist.cpp:96-101)
    assert got == [(0, 1), (0, 2), (0, 4), (2, 0), (2, 3), (4, 0)]


def test_hash_weights_match_fixture_rule(spark, tmp_txt):
    path = tmp_txt("g.txt", "0 1\n5 7\n")
    got = with_hash_weights(read_edgelist(spark, path)).collect()
    want = {
        (r["src"], r["dst"]): r["weight"]
        for r in make_edges_df(spark, [(0, 1), (5, 7)]).collect()
    }
    assert len(got) == 2
    for r in got:
        assert r["weight"] == want[(r["src"], r["dst"])]
        assert 1.0 <= r["weight"] < 10.0


def test_edgelist_roundtrip_and_desc_parity(spark, tmp_path, tmp_txt):
    src_path = tmp_txt("g.txt", EDGELIST_TXT)
    e = read_edgelist(spark, src_path)
    out = str(tmp_path / "out_edges")
    write_edgelist(e, out)
    back = read_edgelist(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, e.collect()))
    # .desc stats parity (convert.cpp:139-148 fields)
    assert G.graph_stats(back) == {
        "min_vertex_id": 0,
        "max_vertex_id": 4,
        "num_edges": 6,
        "max_out_edges": 2,
    }


def test_adjlist_roundtrip_preserves_multiset(spark, tmp_path):
    # duplicate edges survive the roundtrip (collect_list, not set)
    e = make_edges_df(
        spark, [(0, 1), (0, 1), (0, 2), (7, 3)], weighted=False
    )
    out = str(tmp_path / "out_adj")
    write_adjlist(e, out)
    back = read_adjlist(spark, out)
    assert sorted(map(tuple, back.collect())) == [
        (0, 1),
        (0, 1),
        (0, 2),
        (7, 3),
    ]


def test_weighted_roundtrip(spark, tmp_path):
    e = with_hash_weights(
        make_edges_df(spark, [(0, 1), (2, 3)], weighted=False)
    )
    out = str(tmp_path / "out_w")
    write_edgelist(e, out)
    back = read_edgelist(spark, out, weighted=True)
    want = {(r["src"], r["dst"]): r["weight"] for r in e.collect()}
    for r in back.collect():
        # 6 decimal places in the text format
        assert abs(r["weight"] - want[(r["src"], r["dst"])]) < 1e-6
