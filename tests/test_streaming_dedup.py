"""Streaming dedup: built-in watermarked first-arrival suppression and
the applyInPandasWithState duplicate tracker (fog_spark/streaming/dedup.py)."""

import datetime as dt

from pyspark.sql import functions as F

from fog_spark.streaming.dedup import (
    streaming_dedup_within_watermark,
    streaming_duplicate_counts,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _pages(spark, rows):
    """rows: (url, minutes_offset, text)."""
    return spark.createDataFrame(
        [
            (url, T0 + dt.timedelta(minutes=m), text.encode(), text, "en")
            for url, m, text in rows
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def _run(df, out_dir, ckpt, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_dedup_first_arrival_wins(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    _pages(
        spark,
        [
            ("https://a.test/1", 0, "body one"),
            ("https://b.test/1", 1, "body one"),  # exact dup, later ts
            ("https://a.test/2", 2, "body two"),
            ("https://c.test/1", 3, "body one"),  # another dup
        ],
    ).write.mode("append").parquet(pages_dir)

    out = streaming_dedup_within_watermark(spark, pages_dir, watermark="1 hour")
    _run(out, "dedup_wm", ckpt, "append")
    got = {
        r["text"]: r["url"]
        for r in spark.sql("SELECT * FROM dedup_wm").collect()
    }
    assert set(got) == {"body one", "body two"}
    # within one micro-batch Spark keeps one arbitrary-but-single row per
    # fingerprint; the contract here is suppression, not which copy
    assert got["body one"].endswith("/1")


def _run_foreach_parquet(df, out_dir, ckpt):
    # memory sink cannot recover from a checkpoint; foreachBatch can —
    # and checkpoint recovery across runs is exactly what this test pins
    q = (
        df.writeStream.foreachBatch(
            lambda b, _eid: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_duplicate_counts_stateful(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    _pages(
        spark,
        [
            ("https://b.test/1", 5, "shared body"),
            ("https://a.test/1", 0, "shared body"),
            ("https://a.test/2", 2, "unique body"),
        ],
    ).write.mode("append").parquet(pages_dir)

    out1 = str(tmp_path / "out1")
    _run_foreach_parquet(streaming_duplicate_counts(spark, pages_dir), out1, ckpt)
    got = {
        r["first_url"]: (r["n_copies"], r["first_ts"])
        for r in spark.read.parquet(out1).collect()
    }
    # earliest (ts, url) wins as the canonical first copy
    assert got["https://a.test/1"] == (2, T0)
    assert got["https://a.test/2"][0] == 1

    # second wave: two more copies of the shared body, one brand-new body;
    # checkpointed state must carry the old counts forward
    _pages(
        spark,
        [
            ("https://c.test/1", 10, "shared body"),
            ("https://d.test/1", 11, "shared body"),
            ("https://d.test/2", 12, "new body"),
        ],
    ).write.mode("append").parquet(pages_dir)
    out2 = str(tmp_path / "out2")
    _run_foreach_parquet(streaming_duplicate_counts(spark, pages_dir), out2, ckpt)
    got2 = {
        r["first_url"]: r["n_copies"] for r in spark.read.parquet(out2).collect()
    }
    # update mode emits only keys changed by THIS run's batches
    assert got2 == {"https://a.test/1": 4, "https://d.test/2": 1}


def test_stream_and_batch_fingerprints_agree(spark, tmp_path):
    # the streaming fp must equal the batch dedup/mirror fingerprint so
    # decisions compose across the two planes
    df = _pages(spark, [("https://a.test/1", 0, "same body")])
    from fog_spark.operators.mirrors import host_fingerprints

    batch_fp = host_fingerprints(df).collect()[0]["fp"]
    stream_fp = df.select(
        F.md5(F.col("text").cast("binary")).alias("fp")
    ).collect()[0]["fp"]
    assert batch_fp == stream_fp
