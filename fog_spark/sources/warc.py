"""WARC source — read Common-Crawl-style WARC files into the pages table.

The reference ingests SNAP text edge lists
(/root/reference/convert/process_edgelist.cpp:55-221); the web-scale
analog of "the file format crawls actually arrive in" is ISO 28500 WARC
(public spec; what Common Crawl publishes). This reader turns
``*.warc`` / ``*.warc.gz`` files into the repo's canonical pages frame
``(url, warc_ts, html, ...)``, feeding the same extraction pipeline as
the parquet source.

Plan shape:

- ``spark.read.format("binaryFile")`` lists and reads files in parallel
  (one task per file; Spark's binaryFile source prunes on path and never
  ships content to the driver);
- a ``mapInPandas`` Arrow stage parses records with a pure-Python
  scanner — parsing is per-file independent, CPU-bound, and streams
  record-by-record from a memoryview (no per-record copies of the whole
  file);
- gzip members are handled by ``gzip.GzipFile``, which reads the
  member-per-record concatenation Common Crawl uses transparently.

Scale honesty: parallelism in ``read_warc`` is per-FILE. Common Crawl
segments are ~1 GB with ~25k records, and a crawl has ~72k files —
ample tasks for any cluster, but a single huge WARC would serialize.
``read_warc_split`` is the splittable path for that case: gzip members
ARE the split points (Common Crawl gzips one record per member
precisely so ranges are seekable), so pass 1 fans byte ranges across
tasks, each range scans its slice for gzip-magic candidates and
VALIDATES each by actually inflating it (a candidate is a member start
iff it inflates cleanly to bytes beginning with ``WARC/`` — false
magics inside compressed data fail within a block), and each validated
member is parsed where it was found. Offsets partition exactly (a
member belongs to the unique range containing its first byte), so the
union over ranges is the same record multiset the sequential reader
produces — pytest pins the equality. Per-task memory: one
``range_bytes`` compressed window + one decompressed member at a time.
The sandbox validates local paths; on a cluster the same two-pass shape
runs wherever tasks can open the file (POSIX/NFS now; an fsspec/Hadoop
open hook is the one-line extension point, _open_local).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, warc_type string, "
    "record_id string, content_type string, warc_file string"
)


def _parse_warc_stream(stream, fname: str) -> Iterator[dict]:
    """Yield one dict per WARC record from a binary file-like object.
    Tolerant scanner: skips leading noise up to the next version line,
    requires Content-Length (mandatory per spec), leaves the payload
    untouched except for response records, where the HTTP body is split
    off the HTTP headers (the part a pages table wants as ``html``)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # inter-record padding or junk — resync
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            continue  # unrecoverable header block — resync on next version line
        if length < 0:
            # read(-1) would swallow the rest of the file as one payload
            continue
        payload = stream.read(length)
        body = payload
        if headers.get("warc-type") == "response" and payload[:5] in (b"HTTP/",):
            split = payload.find(b"\r\n\r\n")
            if split != -1:
                body = payload[split + 4:]
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "html": body,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "warc_file": fname,
        }


# records per emitted Arrow batch: bounds executor-Python memory to
# ~CHUNK decompressed payloads (+ the compressed file bytes binaryFile
# hands us) instead of a whole ~5 GB decompressed segment at once
_CHUNK_RECORDS = 1024

_COLUMNS = [
    "url", "warc_ts", "html", "warc_type",
    "record_id", "content_type", "warc_file",
]


def _to_pdf(out: list[dict]) -> pd.DataFrame:
    df = pd.DataFrame(out, columns=_COLUMNS)
    # force a real datetime dtype (an object column of Timestamps —
    # or an all-object empty frame — trips the Arrow converter)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def _iter_records(stream, fname: str) -> Iterator[dict]:
    """Parsed records with the warc_date -> warc_ts conversion applied —
    the shared post-processing of both the per-file and the per-range
    readers."""
    for rec in _parse_warc_stream(stream, fname):
        ts = pd.to_datetime(rec.pop("warc_date"), utc=True, errors="coerce")
        rec["warc_ts"] = None if ts is pd.NaT else ts.tz_localize(None)
        yield rec


def _records_from_binary(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    emitted = False
    for pdf in batch_iter:
        out: list[dict] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            raw = bytes(content)
            stream: io.BufferedIOBase
            if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
                stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
            else:
                stream = io.BytesIO(raw)
            for rec in _iter_records(stream, path):
                out.append(rec)
                if len(out) >= _CHUNK_RECORDS:
                    yield _to_pdf(out)
                    emitted = True
                    out = []
        if out or not emitted:
            yield _to_pdf(out)
            emitted = True


def read_warc(
    spark: SparkSession, path: str, warc_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """(url, warc_ts, html, warc_type, record_id, content_type,
    warc_file) — one row per WARC record of the requested types.
    ``html`` is the HTTP response body for response records (HTTP
    headers stripped), the raw payload otherwise. Compose with
    functions/extract + operators/hostgraph for the full
    WARC -> link-graph pipeline."""
    binary = spark.read.format("binaryFile").load(path)
    recs = binary.select("path", "content").mapInPandas(
        _records_from_binary, schema=WARC_SCHEMA
    )
    if warc_types:
        recs = recs.where(recs["warc_type"].isin(list(warc_types)))
    return recs


_GZ_MAGIC = b"\x1f\x8b\x08"


def _open_local(path: str):
    """Open a task-side file handle for a Spark-listed URI. Local paths
    only in this sandbox; swap in fsspec/Hadoop here for object stores."""
    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):
            local = local[1:]
    elif "://" in path:
        raise NotImplementedError(
            f"read_warc_split: non-local scheme in {path!r} — extend "
            "_open_local with an fsspec/Hadoop open for cluster storage"
        )
    else:
        local = path
    return open(local, "rb")


def _inflate_member(f, off: int) -> tuple[bytes, int] | None:
    """Inflate ONE gzip member starting at ``off``; return (bytes,
    next_offset) iff it inflates cleanly AND begins with 'WARC/'
    (validates magic-scan candidates: a false positive inside compressed
    data fails the huffman tables / CRC within a block; a real member
    that is not a WARC record is skipped). next_offset = first byte
    after the member — the next member starts exactly there, letting the
    caller skip scanning the member's own compressed body."""
    import zlib

    d = zlib.decompressobj(wbits=31)
    f.seek(off)
    out = bytearray()
    checked = False
    while not d.eof:
        chunk = f.read(1 << 16)
        if not chunk:
            return None  # truncated member
        try:
            out += d.decompress(chunk)
        except zlib.error:
            return None
        if not checked and len(out) >= 5:
            if bytes(out[:5]) != b"WARC/":
                return None
            checked = True
    if not (checked or bytes(out[:5]) == b"WARC/"):
        return None
    return bytes(out), f.tell() - len(d.unused_data)


def _records_from_ranges(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over (path, start, end) byte ranges: emit the
    records of every gzip member whose first byte lies in [start, end).
    Non-gzip files are not splittable — the start==0 range parses the
    whole file, other ranges yield nothing."""
    emitted = False
    out: list[dict] = []
    for pdf in batch_iter:
        for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
            with _open_local(path) as f:
                head = f.read(3)
                if head != _GZ_MAGIC:
                    if start == 0:
                        f.seek(0)
                        stream = io.BytesIO(f.read())
                        for rec in _iter_records(stream, path):
                            out.append(rec)
                            if len(out) >= _CHUNK_RECORDS:
                                yield _to_pdf(out)
                                emitted, out = True, []
                    continue
                start, end = int(start), int(end)
                f.seek(start)
                # +2 so a magic straddling the range end is still seen by
                # the range that OWNS its first byte
                window = f.read(end - start + 2)
                pos = window.find(_GZ_MAGIC)
                while pos != -1 and start + pos < end:
                    res = _inflate_member(f, start + pos)
                    if res is None:
                        pos = window.find(_GZ_MAGIC, pos + 1)
                        continue
                    data, next_off = res
                    for rec in _iter_records(io.BytesIO(data), path):
                        out.append(rec)
                        if len(out) >= _CHUNK_RECORDS:
                            yield _to_pdf(out)
                            emitted, out = True, []
                    # the next member begins exactly at next_off — skip
                    # this member's compressed body in the scan
                    pos = window.find(_GZ_MAGIC, next_off - start)
    if out or not emitted:
        yield _to_pdf(out)


def read_warc_split(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] = ("response",),
    range_bytes: int = 32 << 20,
) -> DataFrame:
    """Splittable twin of :func:`read_warc` for FEW HUGE ``.warc.gz``
    archives (member-per-record layout): pass 1 lists files (path,
    length) — content column pruned, nothing is read — and fans
    ``range_bytes`` byte ranges across tasks; pass 2 scans each range
    for validated gzip-member starts and parses the members it owns.
    Same schema and row multiset as read_warc (pytest-pinned), but a
    single 100 GB archive becomes ~3200 parallel tasks instead of one."""
    files = [
        (r["path"], int(r["length"]))
        for r in spark.read.format("binaryFile").load(path).select("path", "length").collect()
    ]
    ranges = [
        (p, s, min(s + range_bytes, ln))
        for p, ln in files
        for s in range(0, max(ln, 1), range_bytes)
    ]
    rdf = spark.createDataFrame(ranges, "path string, start long, end long")
    rdf = rdf.repartition(max(len(ranges), 1))
    recs = rdf.mapInPandas(_records_from_ranges, schema=WARC_SCHEMA)
    if warc_types:
        recs = recs.where(recs["warc_type"].isin(list(warc_types)))
    return recs


def write_warc(rows: list[dict], path: str, compress: bool = False) -> None:
    """Write records as a spec-shaped WARC file (testing/round-trip
    helper; one gzip member per record when ``compress``, the Common
    Crawl layout). rows: dicts with url, warc_date (ISO string), body
    (bytes), optional http (bool, wrap body in a minimal HTTP/1.1 200)."""
    out = io.BytesIO()
    for i, r in enumerate(rows):
        payload = r["body"]
        if r.get("http", True):
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
            )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:test-{i}>\r\n".encode()
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['warc_date']}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        member = head + payload + b"\r\n\r\n"
        out.write(gzip.compress(member) if compress else member)
    with open(path, "wb") as f:
        f.write(out.getvalue())
