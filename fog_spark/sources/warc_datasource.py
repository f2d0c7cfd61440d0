"""`fogwarc` — a registered PySpark Data Source for splittable WARC reads.

The third (most Spark-idiomatic) member of the WARC reader family:

- ``read_warc`` (sources/warc.py): one task per file via binaryFile —
  right for Common Crawl's ~72k-file segment layout;
- ``read_warc_split``: mapInPandas over an explicit byte-range frame —
  right for few huge archives, no new API surface;
- THIS module: the same byte-range + validated-gzip-member scan behind
  Spark's Python Data Source API (Spark 4), so planning owns the
  partitions natively::

      spark.dataSource.register(WarcDataSource)
      df = spark.read.format("fogwarc").load("/data/crawl/*.warc.gz")

  Each ``InputPartition`` is one byte range; Spark schedules, retries
  and locality-places ranges like any other scan partitions, and the
  reader streams records per range — no ranges DataFrame, no window
  buffering of whole files on the plain-file path.

Record semantics, member validation and the exact-partitioning argument
(every gzip member belongs to the unique range holding its first byte)
are shared with sources/warc.py; pytest pins row equality across all
three readers. Local filesystem paths in this sandbox (same
``_open_local`` extension point as read_warc_split).
"""

from __future__ import annotations

import glob
import io
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from fog_spark.sources.warc import (
    WARC_SCHEMA,
    _GZ_MAGIC,
    _inflate_member,
    _iter_records,
    _open_local,
)


class WarcRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _list_local(path: str) -> list[tuple[str, int]]:
    """(path, size) for a local file, directory, or glob pattern."""
    if path.startswith("file:"):
        path = path[5:]
        while path.startswith("//"):
            path = path[1:]
    if os.path.isdir(path):
        names = sorted(glob.glob(os.path.join(path, "*")))
    else:
        names = sorted(glob.glob(path)) or [path]
    return [(p, os.path.getsize(p)) for p in names if os.path.isfile(p)]


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fogwarc: .load(path) is required")
        self.range_bytes = int(options.get("range_bytes", 32 << 20))
        # comma-separated record-type filter; empty string = all types
        types = options.get("warc_types", "response")
        self.warc_types = tuple(t for t in types.split(",") if t)

    def partitions(self) -> list[WarcRange]:
        rb = self.range_bytes
        return [
            WarcRange(p, s, min(s + rb, ln))
            for p, ln in _list_local(self.path)
            for s in range(0, max(ln, 1), rb)
        ]

    def read(self, part: WarcRange) -> Iterator[tuple]:
        def rows(stream, fname):
            for rec in _iter_records(stream, fname):
                if self.warc_types and rec["warc_type"] not in self.warc_types:
                    continue
                ts = rec["warc_ts"]
                yield (
                    rec["url"],
                    None if ts is None else ts.to_pydatetime(),
                    rec["html"],
                    rec["warc_type"],
                    rec["record_id"],
                    rec["content_type"],
                    rec["warc_file"],
                )

        with _open_local(part.path) as f:
            if f.read(3) != _GZ_MAGIC:
                if part.start == 0:  # plain files are not splittable
                    f.seek(0)
                    yield from rows(f, part.path)
                return
            f.seek(part.start)
            window = f.read(part.end - part.start + 2)
            pos = window.find(_GZ_MAGIC)
            while pos != -1 and part.start + pos < part.end:
                res = _inflate_member(f, part.start + pos)
                if res is None:
                    pos = window.find(_GZ_MAGIC, pos + 1)
                    continue
                data, next_off = res
                yield from rows(io.BytesIO(data), part.path)
                pos = window.find(_GZ_MAGIC, next_off - part.start)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fogwarc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)
