"""FOG binary CSR ingest (sources/fogbin.py) vs the converter's layout:
an in-test fixture writer emits the exact byte format (1-based offsets,
unused edge slot 0, zero buffer padding — convert.cpp:12-29,
process_edgelist.cpp:130-215) and the reader must roundtrip the same
edge multiset as the text twin, at any split granularity."""

import struct

import pytest
from pyspark.sql import functions as F

from fog_spark.sources.fogbin import (
    read_fog_desc,
    read_fog_graph,
    write_fog_binary,
)
from tests.conftest import make_edges_df
from tests import graphs as GX


def _multiset(rows, cols=("src", "dst")):
    out = {}
    for r in rows:
        k = tuple(r[c] for c in cols)
        out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("gname", ["two_triangles", "star_hub"])
def test_roundtrip_type2(spark, tmp_path, gname):
    edges, _n = GX.ALL_GRAPHS[gname]
    df = make_edges_df(spark, edges)
    desc = write_fog_binary(df, str(tmp_path / "g"), edge_type=2)
    got = read_fog_graph(spark, desc)
    assert _multiset(got.collect()) == _multiset(df.collect())


def test_roundtrip_type1_weights_and_multiedges(spark, tmp_path):
    # multi-edges survive (two slots), weights roundtrip at f32 precision
    import numpy as np

    from fog_spark.sources.edgelist import with_hash_weights

    pairs = [(0, 5), (0, 5), (0, 3), (2, 0), (7, 1)]
    df = make_edges_df(spark, pairs)
    desc = write_fog_binary(df, str(tmp_path / "w"), edge_type=1)
    want = {
        (r["src"], r["dst"]): float(np.float32(r["weight"]))
        for r in with_hash_weights(df).collect()
    }
    got = read_fog_graph(spark, desc).collect()
    assert _multiset(got) == _multiset(df.collect())
    for r in got:
        assert r["weight"] == want[(r["src"], r["dst"])], r


def test_roundtrip_in_edges(spark, tmp_path):
    edges, _n = GX.ALL_GRAPHS["two_triangles"]
    df = make_edges_df(spark, edges)
    desc = write_fog_binary(
        df, str(tmp_path / "ie"), edge_type=2, with_in_edge=True
    )
    assert read_fog_desc(desc)["with_in_edge"] == 1
    got = read_fog_graph(spark, desc, in_edges=True)
    assert _multiset(got.collect()) == _multiset(df.collect())


def test_splittable_any_chunk_size(spark, tmp_path):
    """Multi-range reads (tiny records_per_chunk forces range splits AND
    carry-in buckets with no index starts of their own) must yield the
    sequential reader's row multiset — the WARC splittability contract
    applied to the CSR files."""
    edges, _n = GX.ALL_GRAPHS["star_hub"]
    df = make_edges_df(spark, edges)
    desc = write_fog_binary(df, str(tmp_path / "s"), edge_type=2)
    whole = _multiset(
        read_fog_graph(spark, desc, records_per_chunk=1 << 20).collect()
    )
    for chunk in (1, 3, 7):
        got = _multiset(
            read_fog_graph(spark, desc, records_per_chunk=chunk).collect()
        )
        assert got == whole, chunk


def test_byte_layout_matches_converter(spark, tmp_path):
    """Pin the on-disk contract itself: slot 0 unused (first record all
    zeros), offsets 1-based, offset 0 for vertices without out-edges,
    files padded to buffer_len record multiples (convert.cpp:21-25,
    process_edgelist.cpp:207-215)."""
    df = make_edges_df(spark, [(1, 2), (1, 3), (3, 1)])  # vertex 2: no out
    desc = write_fog_binary(
        df, str(tmp_path / "b"), edge_type=2, buffer_len=16
    )
    d = read_fog_desc(desc)
    assert d["num_of_edges"] == 3 and d["max_out_edges"] == 2
    prefix = desc[: -len(".desc")]
    edge = open(prefix + ".edge", "rb").read()
    idx = open(prefix + ".index", "rb").read()
    assert edge[:4] == b"\x00" * 4  # unused slot 0
    assert len(edge) % (16 * 4) == 0 and len(idx) % (16 * 8) == 0
    offs = [
        struct.unpack("<Q", idx[i : i + 8])[0] for i in range(0, 4 * 8, 8)
    ]
    # vids 0..3 -> offsets: 0 (no vertex 0), 1 (first edge), 0 (dst-only
    # vertex 2), 3 (vertex 3's first edge is edge #3)
    assert offs == [0, 1, 0, 3]
    # edge records in src-sorted, dst-ascending order
    dsts = [struct.unpack("<I", edge[i : i + 4])[0] for i in (4, 8, 12)]
    assert dsts == [2, 3, 1]


def test_reader_handles_short_index(spark, tmp_path):
    """max_vertex_id can exceed the index extent when the top vid is
    dst-only and past the last flushed src bucket — the range kernel
    short-reads instead of erroring."""
    df = make_edges_df(spark, [(0, 999)])
    desc = write_fog_binary(df, str(tmp_path / "t"), edge_type=2, buffer_len=4)
    d = read_fog_desc(desc)
    assert d["max_vertex_id"] == 999
    got = read_fog_graph(spark, desc).collect()
    assert [(r["src"], r["dst"]) for r in got] == [(0, 999)]


def test_cli_fogbin_format(spark, tmp_path):
    from fog_spark.__main__ import main

    df = make_edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    desc = write_fog_binary(df, str(tmp_path / "cli"), edge_type=2)
    out = tmp_path / "pr_out"
    assert main(
        ["--algo", "pagerank", "--format", "fogbin", "--edges", desc,
         "--pagerank-niters", "2", "--output", str(out)],
        spark=spark,
    ) == 0
    assert spark.read.parquet(str(out)).count() == 3


def test_validate_catches_truncation(spark, tmp_path):
    """A truncated .edge file short-reads SILENTLY by design (range
    kernels yield what exists); validate=True must convert that into a
    loud error against the .desc edge count (review finding)."""
    import os

    df = make_edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0)])
    desc = write_fog_binary(df, str(tmp_path / "v"), edge_type=2, buffer_len=2)
    # healthy file validates clean
    assert read_fog_graph(spark, desc, validate=True).count() == 5
    # chop the tail off .edge (slot 0 + first 2 records survive)
    edge_path = desc[: -len(".desc")] + ".edge"
    data = open(edge_path, "rb").read()
    with open(edge_path, "wb") as f:
        f.write(data[: 3 * 4])
    with pytest.raises(ValueError, match="declares 5"):
        read_fog_graph(spark, desc, validate=True)
    # default stays lazy/silent (documented)
    assert read_fog_graph(spark, desc).count() < 5
