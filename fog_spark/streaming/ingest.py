"""Structured-Streaming ingest: incremental crawl -> edge-table appends.

FOG is strictly batch (no streaming anywhere in the reference); this is
the Spark-native extension for a continuously-arriving crawl: new page
files land in a directory (stand-in for a Kafka/WARC feed), outlinks are
extracted incrementally with the SAME native extraction expressions as
batch, and per-vertex degree aggregates are maintained with a watermark
on warc_ts. Algorithms then run on the accumulated edge table — the
streaming layer only maintains ingest + cheap monotone aggregates; the
iterative fixpoints stay batch (correct semantics for them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fog_spark.functions.extract import extract_outlinks_col
from fog_spark.hashing import pmod


def stream_edges_from_pages(
    spark: SparkSession, pages_dir: str, schema=None
) -> DataFrame:
    """readStream over a pages directory -> streaming (src, dst, weight).

    Uses the fixture url->id parse (stateless) rather than the dictionary
    join: a stream-static join against a url dictionary is the cluster
    variant once the dictionary lives in Iceberg.
    """
    if schema is None:
        schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages = spark.readStream.schema(schema).parquet(pages_dir)
    ids = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    linked = pages.select(
        ids.alias("src"),
        F.col("warc_ts"),
        F.explode(extract_outlinks_col(F.col("html"))).alias("dst_url"),
    )
    dst = F.regexp_extract("dst_url", r"/p/(\d+)$", 1).cast("long")
    w = 1.0 + pmod(F.xxhash64(F.col("src"), dst), F.lit(9000)) / 1000.0
    return linked.select("src", dst.alias("dst"), w.alias("weight"), "warc_ts")


def streaming_degrees(edges: DataFrame) -> DataFrame:
    """Continuously-maintained out-degree per src (update-mode output).

    A GLOBAL aggregate: state is keyed by src — bounded by the vertex
    vocabulary, not the stream length — and every row counts regardless
    of arrival time. No watermark is applied because none would act: a
    watermark only gates operators keyed on event time (see
    :func:`streaming_host_link_windows` for the windowed shape)."""
    return edges.groupBy("src").agg(F.count("*").alias("outdeg"))


def _stream_host_pairs(spark: SparkSession, pages_dir: str, schema=None) -> DataFrame:
    from fog_spark.operators.hostgraph import host_of

    if schema is None:
        schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages = spark.readStream.schema(schema).parquet(pages_dir)
    linked = pages.select(
        F.col("warc_ts"),
        host_of(F.col("url")).alias("src_host"),
        F.explode(extract_outlinks_col(F.col("html"))).alias("dst_url"),
    )
    return linked.select(
        "warc_ts", "src_host", host_of(F.col("dst_url")).alias("dst_host")
    )


def streaming_host_link_counts(
    spark: SparkSession, pages_dir: str, schema=None
) -> DataFrame:
    """Continuously-maintained (src_host, dst_host, n_links) rollup over
    the incoming page stream — the streaming twin of
    operators/hostgraph.host_link_counts, same host_of expression, so a
    batch host graph built later from the accumulated edge table agrees
    with the streaming totals.

    A GLOBAL aggregate (update-mode output): state is keyed by host
    pair — bounded by the host-pair vocabulary, not the stream length —
    and every row counts whenever it arrives. No watermark is applied
    because none would act on a non-time-keyed aggregate; use
    :func:`streaming_host_link_windows` when late-data bounds and state
    eviction are required."""
    return (
        _stream_host_pairs(spark, pages_dir, schema)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def streaming_host_link_windows(
    spark: SparkSession,
    pages_dir: str,
    schema=None,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window, src_host, dst_host, n_links) per tumbling event-time
    window — the shape where a watermark is REAL: rows later than the
    watermark are dropped, closed windows emit once under append mode,
    and per-window state is evicted (bounded by windows-in-flight x
    host pairs, the 100 TB requirement for an unbounded stream)."""
    return (
        _stream_host_pairs(spark, pages_dir, schema)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
