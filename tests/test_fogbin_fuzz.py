"""Hypothesis fuzz of the FOG binary CSR roundtrip and the chunked
ranking equality — the property complement to test_fogbin's /
test_graph's hand-picked fixtures:

1. write_fog_binary -> read_fog_graph preserves the edge MULTISET of
   any small multigraph (multi-edges, self-loops, id gaps, dst-only
   max vids), for both edge types and the in-edge CSR, at an
   adversarially tiny records_per_chunk (split + carry-in machinery
   engaged on every example).
2. ranked_out_edges' range-chunked hub path equals the single-window
   path's exact (src, idx) -> dst map on any multigraph (chunking is
   forced with hub_threshold=1, few chunks, tiny sample).

Each hypothesis example is a BATCH of edges through ONE Spark
write+read, so shrinking isolates a minimal failing multigraph while
per-example cost stays bounded."""

import pytest

pytest.importorskip("hypothesis")  # degrade to skip in minimal envs

import tempfile  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from fog_spark import graph as G  # noqa: E402
from fog_spark.sources.fogbin import read_fog_graph, write_fog_binary  # noqa: E402
from tests.conftest import make_edges_df  # noqa: E402

# small id domain maximizes multi-edge/self-loop/gap collisions while
# keeping the converter's u32 constraint trivially satisfied
_EDGE = st.tuples(st.integers(0, 12), st.integers(0, 12))
_EDGES = st.lists(_EDGE, min_size=1, max_size=40)


def _multiset(rows):
    out: dict = {}
    for r in rows:
        k = (r["src"], r["dst"])
        out[k] = out.get(k, 0) + 1
    return out


@settings(max_examples=8, deadline=None)
@given(edges=_EDGES, etype=st.sampled_from([1, 2]), chunk=st.sampled_from([1, 3, 1 << 20]))
def test_fuzz_fogbin_roundtrip(spark, edges, etype, chunk):
    df = make_edges_df(spark, edges)
    with tempfile.TemporaryDirectory(prefix="fogbin_fuzz_") as d:
        desc = write_fog_binary(
            df, f"{d}/g", edge_type=etype, with_in_edge=True, buffer_len=4
        )
        got = read_fog_graph(
            spark, desc, records_per_chunk=chunk, validate=True
        )
        assert _multiset(got.collect()) == _multiset(df.collect())
        got_in = read_fog_graph(
            spark, desc, in_edges=True, records_per_chunk=chunk
        )
        assert _multiset(got_in.collect()) == _multiset(df.collect())


@settings(max_examples=8, deadline=None)
@given(edges=_EDGES, n_chunks=st.sampled_from([2, 4, 7]))
def test_fuzz_ranked_chunked_equals_window(spark, edges, n_chunks):
    df = make_edges_df(spark, edges)
    win = {
        (r["src"], r["idx"]): r["dst"]
        for r in G.ranked_out_edges(df, hub_threshold=10**9).collect()
    }
    chunked = {
        (r["src"], r["idx"]): r["dst"]
        for r in G.ranked_out_edges(
            df, n_chunks=n_chunks, hub_threshold=1, sample_target=4
        ).collect()
    }
    assert chunked == win
