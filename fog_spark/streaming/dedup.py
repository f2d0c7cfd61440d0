"""Streaming deduplication — exact-dup suppression on an unbounded
page stream.

FOG is strictly batch (no streaming in the reference); this is the
Spark-native extension for a continuously-arriving crawl, where the
batch ``operators/dedup.exact_dedup`` shape ("group the whole corpus")
does not exist. Two shapes, matching how production crawl ingest does it:

1. :func:`streaming_dedup_within_watermark` — Spark's built-in
   ``dropDuplicatesWithinWatermark``: emit the FIRST arrival of each
   content fingerprint, drop re-crawls/mirrors arriving within the
   watermark horizon, and — the 100 TB requirement — EVICT fingerprint
   state once the watermark passes it. Bounded state, at the cost of
   re-admitting a duplicate that re-appears after the horizon (the
   standard tradeoff; a periodic batch dedup over the accumulated table
   catches those).

2. :func:`streaming_duplicate_counts` — a custom stateful operator via
   ``applyInPandasWithState`` (the engine surface Spark's built-ins
   don't cover): per content fingerprint, continuously maintain
   (first_url, first_ts, n_copies) and re-emit the row whenever the
   count changes. This is the live "what is being mirrored right now"
   signal the mirror-host detector (operators/mirrors.py) consumes in
   batch; state is keyed by fingerprint — bounded by distinct content,
   not stream length — and each group's state is a single tiny tuple.

Both key on md5 of the extracted text, the same fingerprint the batch
dedup and mirror operators use, so stream and batch decisions agree.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _fingerprinted(spark: SparkSession, pages_dir: str, schema: str | None) -> DataFrame:
    pages = spark.readStream.schema(schema or PAGES_SCHEMA).parquet(pages_dir)
    # rows with no capture timestamp are dropped: they cannot participate
    # in first-arrival ordering (and a NaT->int64 cast would otherwise
    # yield INT64_MIN, silently hijacking the first-arrival slot forever)
    return pages.where(F.col("warc_ts").isNotNull()).select(
        "url", "warc_ts", "text", F.md5(F.col("text").cast("binary")).alias("fp")
    )


def streaming_dedup_within_watermark(
    spark: SparkSession,
    pages_dir: str,
    schema: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First arrival per content fingerprint; duplicates within the
    watermark horizon are dropped and fingerprint state is evicted as the
    watermark advances (append mode)."""
    return (
        _fingerprinted(spark, pages_dir, schema)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


_COUNT_OUT = "fp string, first_url string, first_ts timestamp, n_copies long"
_COUNT_STATE = "first_url string, first_ts long, n_copies long"


def _count_dups(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-fingerprint fold: keep the earliest-arrival (min warc_ts, url
    as tie-break — deterministic under any batch/partition order), count
    every copy ever seen. Timestamps ride as int64 micros inside the
    state tuple (state structs carry primitives)."""
    rows = pd.concat(list(batches), ignore_index=True)
    # normalize to int64 MICROseconds whatever resolution Arrow handed us
    # (pandas defaults to datetime64[ns], where a bare astype(int64)
    # would be nanos and shift the reconstructed timestamp 1000x)
    rows = rows.assign(
        _ts=rows["warc_ts"].astype("datetime64[us]").astype("int64")
    ).sort_values(["_ts", "url"])
    first = rows.iloc[0]
    b_url, b_ts, b_n = first["url"], int(first["_ts"]), len(rows)
    if state.exists:
        s_url, s_ts, s_n = state.get
        if (b_ts, b_url) < (s_ts, s_url):
            s_url, s_ts = b_url, b_ts
        s_n += b_n
    else:
        s_url, s_ts, s_n = b_url, b_ts, b_n
    state.update((s_url, s_ts, s_n))
    yield pd.DataFrame(
        {
            "fp": [key[0]],
            "first_url": [s_url],
            "first_ts": [pd.Timestamp(s_ts, unit="us")],
            "n_copies": [s_n],
        }
    )


def streaming_duplicate_counts(
    spark: SparkSession, pages_dir: str, schema: str | None = None
) -> DataFrame:
    """(fp, first_url, first_ts, n_copies) — continuously-maintained
    per-content duplication tracker (update mode): re-emits a
    fingerprint's row whenever new copies arrive. Arrow-batched custom
    state, one tuple per distinct fingerprint."""
    return (
        _fingerprinted(spark, pages_dir, schema)
        .groupBy("fp")
        .applyInPandasWithState(
            _count_dups,
            outputStructType=_COUNT_OUT,
            stateStructType=_COUNT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
