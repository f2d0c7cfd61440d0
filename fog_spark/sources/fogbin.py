"""FOG binary CSR ingest: ``.desc`` / ``.index`` / ``.edge`` readers.

The reference's converter emits three files per graph
(/root/reference/convert/convert.cpp:12-29): an INI-ish ``.desc``
(min/max vid, edge count, max out-degree, edge_type, with_in_edge —
convert.cpp:139-148), a ``.index`` of one little-endian u64 offset per
vertex id, and a src-sorted ``.edge`` of fixed-size records — type1 is
``<u32 dst, f32 weight>`` (8 bytes, headers/types.hpp:35-47), type2 is
``<u32 dst>`` (4 bytes, types.hpp:49-60). Offsets are **1-based**: the
converter counts edges from 1 and stamps ``offset[src] = num_edges`` at
each src's first edge (process_edgelist.cpp:130, 186-196 after
``num_edges++`` in read_one_edge, :264), deliberately leaving edge slot
0 unused so ``offset == 0`` unambiguously means "no out-edges"
(convert.cpp:21-25). Files are zero-padded to buffer multiples
(process_edgelist.cpp:207-215 flushes full 4M-entry buffers), so the
valid extent comes from the ``.desc`` counts, never the file size. The
optional dst-sorted in-edge CSR (``.in-index`` / ``.in-edge``, records
``<u32 src>``, types.hpp:27-33) follows the same 1-based discipline
(k_way_merge.cpp:295-323).

Spark-first shape (mirrors the splittable WARC reader,
sources/warc.py): fixed-size records make both binaries trivially
splittable — pass 1 fans (record_lo, record_hi) ranges across tasks
from the ``.desc`` counts alone; pass 2 decodes each range with one
``numpy.frombuffer`` inside a bounded ``mapInPandas`` kernel (Arrow
batches, no per-row Python). Edge→src assignment never sorts or scans
globally: edges and nonzero index entries are bucketed by edge
position ``pos div B``; each bucket's carry-in vertex (the one whose
range spans the bucket boundary) comes from a cumulative max over the
*bucket-count-sized* stats frame (~num_edges/B rows — the one global
window, bounded metadata, documented); a cogrouped ``applyInPandas``
then binary-searches (``np.searchsorted``) each bucket's positions
against its starts. A 10^8-degree hub spans many buckets, so no task
ever owns a hub's whole range — the converter's radix-sorted layout is
consumed with the CSR build's salting discipline.

``write_fog_binary`` is the fixture twin: a driver-side writer
(bounded ``collect`` — a test/export utility, not a pipeline stage)
emitting the exact byte layout above so roundtrip tests and the
``text_scans`` gate slot can exercise the reader against the SQL edge
oracle.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_IDX_REC = 8  # u64 offset per vertex (types.hpp:62-67)
_REC_BYTES = {1: 8, 2: 4, "in": 4}
_DESC_KEYS = (
    "min_vertex_id",
    "max_vertex_id",
    "num_of_edges",
    "max_out_edges",
    "edge_type",
    "with_in_edge",
)


def read_fog_desc(path: str) -> dict:
    """Parse a ``.desc`` file (convert.cpp:139-148) into int fields."""
    out: dict = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("["):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                k, v = k.strip(), v.strip()
                if k in _DESC_KEYS:
                    out[k] = int(v)
    missing = [k for k in _DESC_KEYS if k not in out]
    if missing:
        raise ValueError(f"{path}: missing .desc keys {missing}")
    return out


def _ranges_df(spark: SparkSession, n_records: int, per_chunk: int) -> DataFrame:
    n_chunks = max(1, (n_records + per_chunk - 1) // per_chunk)
    return (
        spark.range(n_chunks)
        .select(
            (F.col("id") * per_chunk).alias("lo"),
            F.least(
                (F.col("id") + 1) * per_chunk, F.lit(n_records)
            ).alias("hi"),
        )
        .repartition(n_chunks)
    )


def read_fog_index(
    spark: SparkSession,
    path: str,
    max_vertex_id: int,
    records_per_chunk: int = 1 << 20,
) -> DataFrame:
    """``(vid, start)`` for every vertex with out-edges: the NONZERO
    1-based offsets of ``.index`` entries 0..max_vertex_id (trailing
    zero padding ignored via the bound, convert.cpp:21-25)."""

    def kernel(batches):
        import pandas as pd
        import numpy as np

        emitted = False
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                lo, hi = int(lo), int(hi)
                with open(path, "rb") as f:
                    f.seek(lo * _IDX_REC)
                    buf = f.read((hi - lo) * _IDX_REC)
                offs = np.frombuffer(
                    buf[: (len(buf) // _IDX_REC) * _IDX_REC], dtype="<u8"
                )
                nz = np.nonzero(offs)[0]
                emitted = True
                yield pd.DataFrame(
                    {
                        "vid": (nz + lo).astype("int64"),
                        "start": offs[nz].astype("int64"),
                    }
                )
        if not emitted:
            yield pd.DataFrame({"vid": [], "start": []}).astype("int64")

    rng = _ranges_df(spark, max_vertex_id + 1, records_per_chunk)
    return rng.mapInPandas(kernel, schema="vid long, start long")


def read_fog_edge_records(
    spark: SparkSession,
    path: str,
    num_edges: int,
    edge_type: int | str,
    records_per_chunk: int = 1 << 20,
) -> DataFrame:
    """``(pos, dst[, weight])`` — 1-based edge positions 1..num_edges of
    a ``.edge`` (type1/type2) or ``.in-edge`` (edge_type="in") file;
    the unused slot 0 and any trailing buffer padding are never read."""
    rec = _REC_BYTES[edge_type]
    weighted = edge_type == 1

    def kernel(batches):
        import pandas as pd
        import numpy as np

        emitted = False
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                # positions are 1-based: chunk [lo, hi) covers positions
                # lo+1 .. hi, stored at byte (lo+1)*rec
                lo, hi = int(lo), int(hi)
                with open(path, "rb") as f:
                    f.seek((lo + 1) * rec)
                    buf = f.read((hi - lo) * rec)
                n = len(buf) // rec
                pos = np.arange(lo + 1, lo + 1 + n, dtype="int64")
                emitted = True
                if weighted:
                    arr = np.frombuffer(
                        buf[: n * rec], dtype=[("dst", "<u4"), ("w", "<f4")]
                    )
                    yield pd.DataFrame(
                        {
                            "pos": pos,
                            "dst": arr["dst"].astype("int64"),
                            "weight": arr["w"].astype("float64"),
                        }
                    )
                else:
                    arr = np.frombuffer(buf[: n * rec], dtype="<u4")
                    yield pd.DataFrame(
                        {"pos": pos, "dst": arr.astype("int64")}
                    )
        if not emitted:
            cols = {"pos": [], "dst": []}
            pdf = pd.DataFrame(cols).astype("int64")
            if weighted:
                pdf["weight"] = pd.Series([], dtype="float64")
            yield pdf

    schema = "pos long, dst long" + (", weight double" if weighted else "")
    rng = _ranges_df(spark, num_edges, records_per_chunk)
    return rng.mapInPandas(kernel, schema=schema)


def _assign_src(
    edges: DataFrame, index: DataFrame, per_chunk: int, weighted: bool
) -> DataFrame:
    """Join each edge position to its source vertex: src(pos) = the vid
    with the greatest nonzero start <= pos. Bucketed by pos div B; each
    bucket sees its own index starts plus ONE carry-in row (cumulative
    max over the bucket-stats frame — ~num_edges/B rows, the bounded
    metadata window), then a vectorized searchsorted per bucket."""
    eb = edges.withColumn("_b", (F.col("pos") / per_chunk).cast("long"))
    ib = index.withColumn("_b", (F.col("start") / per_chunk).cast("long"))
    # carry-in: for bucket b, the (start, vid) with max start in buckets
    # STRICTLY BEFORE b — computed over the union of edge- and
    # index-side bucket ids so an edge bucket with no starts of its own
    # still inherits the spanning vertex. Bucket-stats frame is
    # ~num_edges/per_chunk rows; the ordered window over it is bounded
    # metadata, not edge data.
    per_bucket = ib.groupBy("_b").agg(
        F.max(F.struct("start", "vid")).alias("_m")
    )
    bstats = (
        eb.select("_b")
        .distinct()
        .unionByName(per_bucket.select("_b"))
        .distinct()
        .join(per_bucket, "_b", "left")
    )
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    carries = (
        bstats.withColumn("_c", F.max("_m").over(w))
        .where(F.col("_c").isNotNull())
        .select(
            F.col("_b"),
            F.col("_c.start").alias("start"),
            F.col("_c.vid").alias("vid"),
        )
    )
    # a carry's start lies in an earlier bucket, an in-bucket start in
    # its own — the union can never duplicate a row
    prev = ib.select("_b", "start", "vid").unionByName(carries)

    out_fields = "src long, dst long" + (", weight double" if weighted else "")

    def _empty_out():
        import pandas as pd

        out = {
            "src": pd.Series([], dtype="int64"),
            "dst": pd.Series([], dtype="int64"),
        }
        if weighted:
            out["weight"] = pd.Series([], dtype="float64")
        return pd.DataFrame(out)

    def fn(edf, idf):
        import numpy as np
        import pandas as pd

        if edf.empty or idf.empty:
            # idf empty with edges present = malformed file; drop
            return _empty_out()
        idf = idf.sort_values("start")
        starts = idf["start"].to_numpy()
        vids = idf["vid"].to_numpy()
        pos = edf["pos"].to_numpy()
        j = np.searchsorted(starts, pos, side="right") - 1
        ok = j >= 0
        out = {"src": vids[j[ok]], "dst": edf["dst"].to_numpy()[ok]}
        if weighted:
            out["weight"] = edf["weight"].to_numpy()[ok]
        return pd.DataFrame(out)

    # the carry row per bucket arrives via `prev` (start/vid repeated
    # under the edge bucket's _b); cogroup keys on _b
    cg = eb.groupBy("_b").cogroup(prev.groupBy("_b"))
    return cg.applyInPandas(fn, schema=out_fields)


def read_fog_graph(
    spark: SparkSession,
    desc_path: str,
    in_edges: bool = False,
    records_per_chunk: int = 1 << 20,
    validate: bool = False,
) -> DataFrame:
    """The converted graph back as an edge DataFrame: ``(src, dst)``
    (type2) or ``(src, dst, weight)`` (type1); ``in_edges=True`` reads
    the ``.in-index`` / ``.in-edge`` CSR instead (same (src, dst) edge
    multiset, grouped by dst on disk — types.hpp:27-33).

    ``validate=True`` counts the assembled frame against the ``.desc``
    edge count and raises on mismatch — a truncated ``.edge``/``.index``
    file otherwise short-reads SILENTLY (the range kernels yield fewer
    records and an index-less bucket drops its edges), which every
    downstream algorithm would happily compute on. Costs one full
    decode pass up front, so it is opt-in: flip it on for ingest of
    files you did not just write (the CLI does)."""
    if not desc_path.endswith(".desc"):
        raise ValueError(f"expected a .desc path, got {desc_path!r}")
    d = read_fog_desc(desc_path)
    prefix = desc_path[: -len(".desc")]
    n = d["num_of_edges"]
    if in_edges:
        if not d["with_in_edge"]:
            raise ValueError(f"{desc_path}: with_in_edge = 0")
        idx = read_fog_index(
            spark, prefix + ".in-index", d["max_vertex_id"], records_per_chunk
        )
        recs = read_fog_edge_records(
            spark, prefix + ".in-edge", n, "in", records_per_chunk
        )
        # in-edge CSR: index key is the DESTINATION, record value the
        # source — flip back to (src, dst)
        assigned = _assign_src(recs, idx, records_per_chunk, weighted=False)
        out = assigned.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    else:
        et = int(d["edge_type"])
        idx = read_fog_index(
            spark, prefix + ".index", d["max_vertex_id"], records_per_chunk
        )
        recs = read_fog_edge_records(
            spark, prefix + ".edge", n, et, records_per_chunk
        )
        out = _assign_src(recs, idx, records_per_chunk, weighted=et == 1)
    if validate:
        got = out.count()
        if got != n:
            raise ValueError(
                f"{desc_path}: decoded {got} edges but .desc declares "
                f"{n} — truncated or corrupt "
                f"{'.in-edge/.in-index' if in_edges else '.edge/.index'} file"
            )
    return out


# ---------------------------------------------------------------- writer


def write_fog_binary(
    edges: DataFrame,
    dest_prefix: str,
    edge_type: int = 2,
    with_in_edge: bool = False,
    buffer_len: int = 4096,
) -> str:
    """Emit ``<dest_prefix>.desc/.index/.edge`` (+ ``.in-index`` /
    ``.in-edge``) in the converter's exact byte layout: 1-based offsets,
    unused edge slot 0, zero padding to ``buffer_len`` records
    (the converter pads to 4M-entry buffers, process_edgelist.cpp:
    207-215 — scaled down so fixtures stay small). Driver-side
    ``collect`` — a fixture/export utility for graphs that fit the
    driver, not a pipeline stage. Edges are written src-sorted
    (dst-ascending within src) like the converter requires of its
    input. type1 weights use the ``weight`` column when present, else
    the deterministic hash weight (sources/edgelist.with_hash_weights).
    Returns the ``.desc`` path."""
    from fog_spark.graph import normalize_edges
    from fog_spark.sources.edgelist import with_hash_weights

    e = normalize_edges(edges)
    if edge_type == 1 and "weight" not in e.columns:
        e = with_hash_weights(e)
    cols = ["src", "dst"] + (["weight"] if edge_type == 1 else [])
    rows = e.select(*cols).orderBy("src", "dst").collect()

    os.makedirs(os.path.dirname(dest_prefix) or ".", exist_ok=True)
    rec = _REC_BYTES[edge_type]

    def pad(f, recsize):
        n_recs = f.tell() // recsize
        rem = (-n_recs) % buffer_len
        f.write(b"\x00" * (rem * recsize))

    def write_csr(key_of, val_bytes, idx_path, edge_path, recsize, rws):
        offsets: dict[int, int] = {}
        with open(edge_path, "wb") as f:
            f.write(b"\x00" * recsize)  # unused slot 0
            num = 0
            for r in rws:
                num += 1
                k = key_of(r)
                if k not in offsets:
                    offsets[k] = num  # 1-based first-edge position
                f.write(val_bytes(r))
            pad(f, recsize)
        max_vid_local = max(offsets) if offsets else -1
        with open(idx_path, "wb") as f:
            for v in range(max_vid_local + 1):
                f.write(struct.pack("<Q", offsets.get(v, 0)))
            pad(f, _IDX_REC)
        return num

    if edge_type == 1:
        val = lambda r: struct.pack("<If", r["dst"], r["weight"])
    else:
        val = lambda r: struct.pack("<I", r["dst"])
    num_edges = write_csr(
        lambda r: r["src"], val,
        dest_prefix + ".index", dest_prefix + ".edge", rec, rows,
    )

    if with_in_edge:
        in_rows = sorted(rows, key=lambda r: (r["dst"], r["src"]))
        write_csr(
            lambda r: r["dst"],
            lambda r: struct.pack("<I", r["src"]),
            dest_prefix + ".in-index", dest_prefix + ".in-edge",
            _REC_BYTES["in"], in_rows,
        )

    ids = [r["src"] for r in rows] + [r["dst"] for r in rows]
    degs: dict[int, int] = {}
    for r in rows:
        degs[r["src"]] = degs.get(r["src"], 0) + 1
    desc_path = dest_prefix + ".desc"
    with open(desc_path, "w", encoding="utf-8") as f:
        f.write("[description]\n")
        f.write(f"min_vertex_id = {min(ids) if ids else 0}\n")
        f.write(f"max_vertex_id = {max(ids) if ids else 0}\n")
        f.write(f"num_of_edges = {num_edges}\n")
        f.write(f"max_out_edges = {max(degs.values()) if degs else 0}\n")
        f.write(f"edge_type = {edge_type}\n")
        f.write(f"with_in_edge = {1 if with_in_edge else 0}\n")
    return desc_path
