"""Snapshot collapse + change stats (fog_spark.operators.snapshots)."""

import datetime

from pyspark.sql import functions as F

from fog_spark.operators.snapshots import latest_snapshots, page_change_stats

SF = "/root/testdata/sf0.001"


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), h.encode(), x, lg) for u, t, h, x, lg in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


ROWS = [
    ("https://a.test/1", "2024-01-01T00:00:00", "<h1>v1</h1>", "v1", "en"),
    ("https://a.test/1", "2024-03-01T00:00:00", "<h1>v2</h1>", "v2", "en"),
    ("https://a.test/1", "2024-02-01T00:00:00", "<h1>v2</h1>", "v2", "en"),
    ("https://b.test/2", "2024-01-15T00:00:00", "<p>only</p>", "only", "de"),
]


def test_latest_snapshots_picks_max_ts(spark):
    out = {r["url"]: r for r in latest_snapshots(_pages(spark, ROWS)).collect()}
    assert len(out) == 2
    a = out["https://a.test/1"]
    assert a["text"] == "v2" and a["warc_ts"] == _ts("2024-03-01T00:00:00")
    assert bytes(a["html"]) == b"<h1>v2</h1>"
    b = out["https://b.test/2"]
    assert b["text"] == "only" and b["lang"] == "de"


def test_latest_snapshots_tie_break_deterministic(spark):
    # same url, same ts, different html: the larger xxhash64(html) wins
    # under any row order / partitioning
    rows = [
        ("https://t.test/x", "2024-01-01T00:00:00", "<a>A</a>", "A", "en"),
        ("https://t.test/x", "2024-01-01T00:00:00", "<b>B</b>", "B", "en"),
    ]
    df = _pages(spark, rows)
    one = latest_snapshots(df).collect()[0]["text"]
    two = latest_snapshots(df.orderBy(F.desc("text")).repartition(7)).collect()[0]["text"]
    assert one == two
    h = {
        r["text"]: r["h"]
        for r in df.select("text", F.xxhash64(F.col("html")).alias("h")).collect()
    }
    assert one == max(h, key=lambda t: h[t])


def test_change_stats(spark):
    out = {r["url"]: r for r in page_change_stats(_pages(spark, ROWS)).collect()}
    a = out["https://a.test/1"]
    assert a["n_captures"] == 3 and a["n_versions"] == 2
    assert a["first_ts"] == _ts("2024-01-01T00:00:00")
    assert a["last_ts"] == _ts("2024-03-01T00:00:00")
    assert abs(a["change_ratio"] - 0.5) < 1e-12
    b = out["https://b.test/2"]
    assert b["n_captures"] == 1 and b["n_versions"] == 1 and b["change_ratio"] == 0.0


def test_real_testdata_multi_capture(spark):
    # three captures per doc from the real documents table; every third
    # doc changes text on the last capture
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = d.count()
    k = F.col("doc_id").cast("long")
    base = d.select(
        F.concat(F.lit("https://s.test/p/"), k.cast("string")).alias("url"),
        k.alias("k"),
        F.col("text"),
    )
    caps = None
    for i in range(3):
        txt = (
            F.when((F.col("k") % 3 == 0) & (F.lit(i) == 2),
                   F.concat(F.col("text"), F.lit(" CHANGED")))
            .otherwise(F.col("text"))
        )
        c = base.select(
            "url",
            F.timestamp_seconds(F.lit(1704067200) + F.col("k") + F.lit(i * 86400)).alias("warc_ts"),
            F.encode(txt, "UTF-8").alias("html"),
            txt.alias("text"),
            F.lit("en").alias("lang"),
        )
        caps = c if caps is None else caps.unionByName(c)
    latest = latest_snapshots(caps)
    assert latest.count() == n
    changed = latest.where(F.col("text").endswith("CHANGED")).count()
    assert changed == (n + 2) // 3
    stats = page_change_stats(caps)
    agg = stats.agg(
        F.sum("n_captures").alias("tot"),
        F.count_if(F.col("n_versions") == 2).alias("two_v"),
    ).collect()[0]
    assert agg["tot"] == 3 * n and agg["two_v"] == (n + 2) // 3


def test_change_stats_null_text(spark):
    rows = [
        ("https://n.test/1", _ts("2024-01-01T00:00:00"), None, None, "en"),
        ("https://n.test/1", _ts("2024-02-01T00:00:00"), None, None, "en"),
        ("https://n.test/1", _ts("2024-03-01T00:00:00"), None, "now", "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    s = page_change_stats(df).collect()[0]
    # two NULL captures + one real -> 2 versions, ratio within [0, 1]
    assert s["n_captures"] == 3 and s["n_versions"] == 2
    assert 0.0 <= s["change_ratio"] <= 1.0


def test_latest_snapshots_without_html_column(spark):
    df = spark.createDataFrame(
        [("https://u.test/1", _ts("2024-01-01T00:00:00"), "a"),
         ("https://u.test/1", _ts("2024-02-01T00:00:00"), "b")],
        "url string, warc_ts timestamp, text string",
    )
    out = latest_snapshots(df).collect()
    assert len(out) == 1 and out[0]["text"] == "b"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_edge_delta_added_removed_unchanged(spark):
    from fog_spark.operators.snapshots import edge_delta, edge_delta_stats

    old = _edges(spark, [(0, 1), (1, 2), (2, 3), (2, 3), (3, 0)])  # dup edge
    new = _edges(spark, [(0, 1), (1, 2), (2, 3), (4, 0), (4, 1)])
    got = {(r["src"], r["dst"]): r["change"] for r in edge_delta(old, new).collect()}
    assert got == {(3, 0): "removed", (4, 0): "added", (4, 1): "added"}
    s = edge_delta_stats(old, new).collect()[0]
    assert (s["n_added"], s["n_removed"], s["n_unchanged"]) == (2, 1, 3)
    # churn = (2 + 1) / 4 distinct old edges
    assert abs(s["churn"] - 0.75) < 1e-12


def test_edge_delta_identical_and_disjoint(spark):
    from fog_spark.operators.snapshots import edge_delta, edge_delta_stats

    e = _edges(spark, [(0, 1), (1, 2)])
    assert edge_delta(e, e).count() == 0
    s = edge_delta_stats(e, e).collect()[0]
    assert (s["n_added"], s["n_removed"], s["churn"]) == (0, 0, 0.0)
    other = _edges(spark, [(5, 6)])
    got = {(r["src"], r["dst"]): r["change"] for r in edge_delta(e, other).collect()}
    assert got == {(0, 1): "removed", (1, 2): "removed", (5, 6): "added"}


def test_edge_delta_feeds_warm_refresh(spark):
    # the composed refresh decision: low churn -> warm start converges
    # in fewer iterations than cold on the same new graph
    from fog_spark.algos.pagerank import StandardPageRank, WarmStartPageRank
    from fog_spark.operators.snapshots import edge_delta_stats
    from fog_spark.plans.engine import ScatterGatherEngine
    from tests.conftest import make_edges_df
    from tests import graphs as GX

    base, n = GX.ALL_GRAPHS["two_triangles"]
    new_edges = base + [(0, 5)]
    old_df = make_edges_df(spark, base)
    new_df = make_edges_df(spark, new_edges)
    churn = edge_delta_stats(old_df, new_df).collect()[0]["churn"]
    assert 0 < churn < 0.2
    eng = ScatterGatherEngine(spark, checkpoint_dir=None)
    v = spark.range(n).select("id")
    stale = eng.run(StandardPageRank(tol=1e-9), old_df, vertices=v)
    warm = eng.run(
        WarmStartPageRank(stale.state.select("id", "rank"), tol=1e-9),
        new_df, vertices=v,
    )
    cold = eng.run(StandardPageRank(tol=1e-9), new_df, vertices=v)
    # on a 7-vertex toy the slow-mode tail dominates, so warm can tie
    # cold; never worse, and the fixpoint agrees (the strictly-fewer
    # case is pinned in test_salsa_incremental.py on a larger delta)
    assert warm.iterations <= cold.iterations
    got_w = {r["id"]: r["rank"] for r in warm.state.collect()}
    got_c = {r["id"]: r["rank"] for r in cold.state.collect()}
    assert all(abs(got_w[i] - got_c[i]) < 1e-7 for i in got_w)


def test_recrawl_schedule_estimator(spark):
    """Cho & Garcia-Molina rate estimator + clamped revisit intervals vs
    a pure-Python replay; single-capture and never-changed edges."""
    import math

    from fog_spark.operators.snapshots import page_change_stats, recrawl_schedule

    day = 86400
    rows = []
    # hot.test: 5 captures a day apart, changes every time
    for i in range(5):
        rows.append(("https://hot.test/", 1704067200 + i * day, f"v{i}"))
    # slow.test: 5 captures a day apart, one change
    for i in range(5):
        rows.append(("https://slow.test/", 1704067200 + i * day, "a" if i < 3 else "b"))
    # static.test: never changes
    for i in range(4):
        rows.append(("https://static.test/", 1704067200 + i * day, "same"))
    # once.test: single capture
    rows.append(("https://once.test/", 1704067200, "only"))
    pages = spark.createDataFrame(
        [(u, t, x) for u, t, x in rows], "url string, ts long, text string"
    ).select("url", F.timestamp_seconds("ts").alias("warc_ts"), "text")
    out = {
        r["url"]: r
        for r in recrawl_schedule(page_change_stats(pages)).collect()
    }

    def replay(n_caps, n_vers, span_days):
        n, x = n_caps - 1, n_vers - 1
        r = -math.log((n - x + 0.5) / (n + 0.5))
        lam = r / (span_days / n)  # per day (avg interval in days)
        return lam, min(max(24.0 / lam, 1.0), 24.0 * 30)

    lam, hrs = replay(5, 5, 4)
    assert abs(out["https://hot.test/"]["lambda_per_day"] - lam) < 1e-12
    assert abs(out["https://hot.test/"]["recrawl_hours"] - hrs) < 1e-9
    lam, hrs = replay(5, 2, 4)
    assert abs(out["https://slow.test/"]["lambda_per_day"] - lam) < 1e-12
    assert abs(out["https://slow.test/"]["recrawl_hours"] - hrs) < 1e-9
    # a page that changes every capture revisits far sooner than a slow one
    assert (
        out["https://hot.test/"]["recrawl_hours"]
        < out["https://slow.test/"]["recrawl_hours"]
    )
    # never changed -> rate 0, max interval; single capture -> default
    assert out["https://static.test/"]["lambda_per_day"] == 0.0
    assert out["https://static.test/"]["recrawl_hours"] == 24.0 * 30
    assert out["https://once.test/"]["recrawl_hours"] == 24.0 * 7


def test_change_stats_oscillation_counts_transitions(spark):
    """A,B,A,B,A: 2 distinct versions but a change EVERY interval — the
    transition count (Cho & G-M's X) must see all 4 (review finding)."""
    import math

    from fog_spark.operators.snapshots import page_change_stats, recrawl_schedule

    day = 86400
    rows = [("https://osc.test/", 1704067200 + i * day, "AB"[i % 2]) for i in range(5)]
    pages = spark.createDataFrame(
        rows, "url string, ts long, text string"
    ).select("url", F.timestamp_seconds("ts").alias("warc_ts"), "text")
    st = page_change_stats(pages).collect()[0]
    assert st["n_versions"] == 2 and st["n_changes"] == 4
    assert abs(st["change_ratio"] - 1.0) < 1e-12
    out = recrawl_schedule(page_change_stats(pages)).collect()[0]
    lam = -math.log(0.5 / 4.5)  # X == n: fastest-change estimate
    assert abs(out["lambda_per_day"] - lam) < 1e-12
