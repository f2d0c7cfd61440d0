"""Structured-Streaming ingest: incremental pages -> edge appends ->
watermarked degree aggregates (fog_spark/streaming/ingest.py)."""

from pyspark.sql import functions as F

from fog_spark.sources.pages import generate_edges, generate_pages
from fog_spark.streaming.ingest import stream_edges_from_pages, streaming_degrees

N_DOCS = 120


def _await(q):
    q.awaitTermination(120)


def test_stream_edges_match_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, N_DOCS).cache()
    # batch 1: first 70 docs land
    p1 = pages.where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") < 70
    )
    p1.write.mode("append").parquet(pages_dir)

    stream = stream_edges_from_pages(spark, pages_dir)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await(q)

    want_all = {
        (r["src"], r["dst"], r["weight"])
        for r in generate_edges(spark, N_DOCS).collect()
    }
    got1 = {
        (r["src"], r["dst"], r["weight"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got1 == {t for t in want_all if t[0] < 70}

    # batch 2: the rest arrive; the restarted availableNow query processes
    # ONLY the new files (checkpointed source offsets)
    p2 = pages.where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") >= 70
    )
    p2.write.mode("append").parquet(pages_dir)
    q2 = (
        stream_edges_from_pages(spark, pages_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _await(q2)
    got2 = {
        (r["src"], r["dst"], r["weight"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == want_all
    pages.unpersist()


def test_streaming_degrees_watermark(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    generate_pages(spark, N_DOCS).write.mode("append").parquet(pages_dir)

    deg = streaming_degrees(stream_edges_from_pages(spark, pages_dir))
    q = (
        deg.writeStream.format("memory")
        .queryName("deg_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {r["src"]: r["outdeg"] for r in spark.sql("SELECT * FROM deg_test").collect()}
    want: dict[int, int] = {}
    for r in generate_edges(spark, N_DOCS).collect():
        want[r["src"]] = want.get(r["src"], 0) + 1
    assert got == want


def test_streaming_host_link_counts_match_batch(spark, tmp_path):
    """The streaming host rollup must agree exactly with the batch
    operator over the same pages (same host_of expression both sides)."""
    from fog_spark.operators.hostgraph import host_link_counts
    from fog_spark.streaming.ingest import streaming_host_link_counts

    pages_dir = str(tmp_path / "pages_hosts")
    pages = generate_pages(spark, N_DOCS).cache()
    pages.write.mode("append").parquet(pages_dir)

    q = (
        streaming_host_link_counts(spark, pages_dir)
        .writeStream.format("memory")
        .queryName("host_counts_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in spark.sql("SELECT * FROM host_counts_test").collect()
    }
    want = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_counts(pages).collect()
    }
    assert got == want
    pages.unpersist()


def test_streaming_host_link_windows(spark, tmp_path):
    # windowed variant: watermark is real here (event-time-keyed state);
    # counts per (window, pair) must sum to the global rollup
    from fog_spark.streaming.ingest import streaming_host_link_windows

    pages_dir = str(tmp_path / "pages_w")
    generate_pages(spark, 120).write.parquet(pages_dir)
    win = streaming_host_link_windows(spark, pages_dir, window="1 hour")
    q = (
        win.writeStream.format("memory")
        .queryName("host_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from host_windows").collect()
    assert rows
    assert all(r["window"] is not None and r["n_links"] > 0 for r in rows)
    total = sum(r["n_links"] for r in rows)
    from fog_spark.operators.hostgraph import host_link_counts
    batch = host_link_counts(spark.read.parquet(pages_dir))
    assert total == batch.agg(F.sum("n_links")).collect()[0][0]
