"""Anchor-text rollup (fog_spark.operators.anchortext)."""

from pyspark.sql import functions as F

from fog_spark.operators.anchortext import anchor_text_rollup

SF = "/root/testdata/sf0.001"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_rollup_counts_and_topk(spark):
    # three pages link to T with anchors: "alpha" x2, "beta" x1, one
    # empty anchor (dropped), one nofollow (dropped via follow_only)
    rows = [
        (
            "https://a.test/1",
            '<html><body><a href="https://t.test/T">alpha</a>'
            '<a href="https://t.test/T">beta</a></body></html>',
        ),
        (
            "https://b.test/2",
            '<html><body><a href="https://t.test/T">alpha</a>'
            '<a href="https://t.test/T"></a>'
            '<a rel="nofollow" href="https://t.test/T">spam</a></body></html>',
        ),
        (
            "https://c.test/3",
            '<html><body><a href="https://u.test/U">gamma</a></body></html>',
        ),
    ]
    out = {r["dst_url"]: r for r in anchor_text_rollup(_pages(spark, rows), k=1).collect()}
    t = out["https://t.test/T"]
    assert t["n_refs"] == 3 and t["n_anchors"] == 2
    assert t["top_anchors"] == ["alpha"]
    u = out["https://u.test/U"]
    assert (u["n_refs"], u["n_anchors"], u["top_anchors"]) == (1, 1, ["gamma"])


def test_topk_tiebreak_and_order(spark):
    # equal counts -> lexicographic; top_anchors ordered by rank
    rows = [
        (
            "https://a.test/1",
            '<html><body><a href="/x">zz</a><a href="/x">aa</a>'
            '<a href="/x">aa</a><a href="/x">mm</a></body></html>',
        ),
    ]
    out = anchor_text_rollup(_pages(spark, rows), k=2).collect()
    assert len(out) == 1
    assert out[0]["top_anchors"] == ["aa", "mm"]  # aa x2, then mm/zz tie -> mm


def test_real_testdata_scale_shape(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    k = F.col("doc_id").cast("long")
    html = F.concat(
        F.lit('<html><body><a href="/d/'), (k % 17).cast("string"),
        F.lit('">w'), (k % 5).cast("string"),
        F.lit("</a></body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://h"), (k % 7).cast("string"),
                 F.lit(".test/p/"), k.cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    out = anchor_text_rollup(pages, k=2).collect()
    # 7 hosts x 17 paths = 119 possible dst urls
    assert 0 < len(out) <= 119
    total = sum(r["n_refs"] for r in out)
    assert total == d.count()
    assert all(1 <= len(r["top_anchors"]) <= 2 for r in out)
