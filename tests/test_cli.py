"""CLI smoke tests — the `fog -g ... -a ...` analog
(/root/reference/headers/options_utils.h:22-70)."""

from fog_spark.__main__ import build_parser, main, run
from tests.conftest import make_edges_df
from tests import graphs as GX


def test_cli_pagerank_and_stats(spark, tmp_path):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    elist = "\n".join(f"{s} {d}" for s, d in edges) + "\n"
    src = tmp_path / "g.txt"
    src.write_text(elist)
    out = tmp_path / "pr_out"
    rc = main(
        [
            "--algo", "pagerank", "--edges", str(src), "--format", "edgelist",
            "--pagerank-niters", "2", "--output", str(out),
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["id"]: r["rank"] for r in spark.read.parquet(str(out)).collect()}
    want = GX.fog_pagerank_oracle(edges, n, iters=2)
    # vertices derive from the edge file; isolated vertex 6 is absent (it
    # contributes no messages, so present ranks are unaffected)
    assert set(got) == {v for e in edges for v in e}
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9

    stats = run(
        build_parser().parse_args(
            ["--algo", "stats", "--edges", str(src), "--format", "edgelist"]
        ),
        spark,
    ).collect()[0]
    assert stats["num_edges"] == len(edges)
    assert stats["max_vertex_id"] == max(v for e in edges for v in e)


def test_cli_cc_resume_checkpoint(spark, tmp_path):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    e = make_edges_df(spark, edges)
    pq = tmp_path / "edges_pq"
    e.write.mode("overwrite").parquet(str(pq))
    args = [
        "--algo", "cc", "--edges", str(pq),
        "--checkpoint", str(tmp_path / "ckpt"), "--run-id", "cli-cc",
        "--output", str(tmp_path / "cc_out"),
    ]
    assert main(args, spark=spark) == 0
    # second invocation resumes from the converged checkpoint
    assert main(args, spark=spark) == 0
    got = {r["id"]: r["component"] for r in spark.read.parquet(str(tmp_path / "cc_out")).collect()}
    want = GX.cc_oracle(edges, n)
    present = {v for e in edges for v in e}  # isolated vertex 6 not in edge table
    assert set(got) == present
    assert all(got[v] == want[v] for v in present)


def test_cli_new_algos_smoke(spark, tmp_path):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    elist = "\n".join(f"{s} {d}" for s, d in edges) + "\n"
    src = tmp_path / "g.txt"
    src.write_text(elist)
    for algo, check in [
        ("hits", lambda rows: {"id", "auth_milli", "hub_milli"} <= set(rows[0].asDict())),
        ("salsa", lambda rows: {"id", "salsa_auth_milli", "salsa_hub_milli"} <= set(rows[0].asDict())),
        ("cc-star", lambda rows: {r["component"] for r in rows} == {0, 3}),
        ("mis", lambda rows: all(r["in_mis"] is not None for r in rows)),
        ("hyperball", lambda rows: all(r["sum2k"] > 0 for r in rows)),
        ("node2vec", lambda rows: len(rows) > 0),
        ("spam-mass", lambda rows: all(r["spam_permille"] <= 1000 for r in rows)),
    ]:
        out = tmp_path / f"{algo}_out"
        rc = main(
            ["--algo", algo, "--edges", str(src), "--format", "edgelist",
             "--output", str(out), "--walk-len", "3"],
            spark=spark,
        )
        assert rc == 0, algo
        rows = spark.read.parquet(str(out)).collect()
        assert rows and check(rows), algo


def test_cli_host_rollup_any_algo(spark, tmp_path):
    # --host-rollup runs the chosen algorithm over the host graph and
    # joins host names back onto the vertex ids; --resolve-links routes
    # extraction through urlnorm (identical here: fixture hrefs are
    # already absolute + canonical)
    from fog_spark.sources.pages import generate_pages

    pages_dir = tmp_path / "pages"
    generate_pages(spark, 200).write.parquet(str(pages_dir))
    out = tmp_path / "host_cc"
    rc = main(
        ["--algo", "cc", "--edges", str(pages_dir), "--format", "pages",
         "--host-rollup", "--resolve-links", "--output", str(out)],
        spark=spark,
    )
    assert rc == 0
    rows = spark.read.parquet(str(out)).collect()
    assert rows and {"id", "component", "host"} <= set(rows[0].asDict())
    hosts = {r["host"] for r in rows}
    assert all(h and h == h.lower() for h in hosts)


def test_cli_pagerank_warm(spark, tmp_path):
    edges, n = GX.ALL_GRAPHS["two_triangles"]
    e = make_edges_df(spark, edges)
    pq = tmp_path / "edges_pq"
    e.write.mode("overwrite").parquet(str(pq))
    ranks = tmp_path / "ranks"
    assert main(
        ["--algo", "standard-pagerank", "--edges", str(pq),
         "--output", str(ranks)], spark=spark,
    ) == 0
    out = tmp_path / "warm_out"
    assert main(
        ["--algo", "pagerank-warm", "--edges", str(pq),
         "--warm-ranks", str(ranks), "--output", str(out)], spark=spark,
    ) == 0
    got = {r["id"]: r["rank"] for r in spark.read.parquet(str(out)).collect()}
    want = {r["id"]: r["rank"] for r in spark.read.parquet(str(ranks)).collect()}
    # warm start FROM the fixpoint stays AT the fixpoint
    assert all(abs(got[v] - want[v]) < 1e-6 for v in got)
    # missing --warm-ranks is a clean CLI error
    import pytest
    with pytest.raises(SystemExit):
        main(["--algo", "pagerank-warm", "--edges", str(pq)], spark=spark)


def test_cli_census_redirects_bm25(spark, tmp_path):
    # census over an edge parquet
    edges, _n = GX.ALL_GRAPHS["two_triangles"]
    pq = tmp_path / "edges_pq2"
    make_edges_df(spark, edges).write.mode("overwrite").parquet(str(pq))
    out = tmp_path / "census_out"
    assert main(
        ["--algo", "census", "--edges", str(pq), "--output", str(out)],
        spark=spark,
    ) == 0
    row = spark.read.parquet(str(out)).collect()[0]
    assert row["reciprocity_permille"] == 1000  # fully reciprocal cliques

    # resolve-redirects over a (url, target) parquet
    rmap = tmp_path / "redirects_pq"
    spark.createDataFrame(
        [("a", "b"), ("b", "c")], "url string, target string"
    ).write.mode("overwrite").parquet(str(rmap))
    rout = tmp_path / "redirects_out"
    assert main(
        ["--algo", "resolve-redirects", "--edges", str(rmap), "--output", str(rout)],
        spark=spark,
    ) == 0
    got = {r["url"]: r["final_url"] for r in spark.read.parquet(str(rout)).collect()}
    assert got == {"a": "c", "b": "c"}

    # bm25 over a (doc_id, text) parquet; integer twin
    docs = tmp_path / "docs_pq"
    spark.createDataFrame(
        [(0, "spark join"), (1, "hash table")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(docs))
    bout = tmp_path / "bm25_out"
    assert main(
        ["--algo", "bm25", "--edges", str(docs), "--query", "spark",
         "--bm25-integer", "--output", str(bout)],
        spark=spark,
    ) == 0
    rows = spark.read.parquet(str(bout)).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 0

    # guards: bm25 without --query, redirects without url/target columns
    import pytest

    with pytest.raises(SystemExit):
        main(["--algo", "bm25", "--edges", str(docs)], spark=spark)
    with pytest.raises(SystemExit):
        main(["--algo", "resolve-redirects", "--edges", str(pq)], spark=spark)


def test_cli_redirect_max_hops_guard(spark, tmp_path):
    rmap = tmp_path / "rm_pq"
    spark.createDataFrame(
        [("a", "b")], "url string, target string"
    ).write.mode("overwrite").parquet(str(rmap))
    import pytest

    with pytest.raises(SystemExit):
        main(
            ["--algo", "resolve-redirects", "--edges", str(rmap),
             "--redirect-max-hops", "20"],
            spark=spark,
        )


def test_cli_frontier_plan_and_recrawl(spark, tmp_path):
    from pyspark.sql import functions as F

    pages_pq = tmp_path / "pages_pq"
    spark.createDataFrame(
        [
            (
                "https://a.test/1",
                '<html><a href="https://new.test/x">n</a>'
                '<a href="https://new.test/blocked/y">b</a></html>',
            ),
        ],
        "url string, html_s string",
    ).select(
        "url", F.encode("html_s", "UTF-8").alias("html")
    ).write.mode("overwrite").parquet(str(pages_pq))
    robots_pq = tmp_path / "robots_pq"
    spark.createDataFrame(
        [("new.test", "User-agent: *\nDisallow: /blocked/")],
        "host string, body string",
    ).write.mode("overwrite").parquet(str(robots_pq))
    out = tmp_path / "plan_out"
    assert main(
        ["--algo", "frontier-plan", "--edges", str(pages_pq), "--format", "pages",
         "--robots", str(robots_pq), "--pagerank-niters", "2",
         "--output", str(out)],
        spark=spark,
    ) == 0
    urls = {r["url"] for r in spark.read.parquet(str(out)).collect()}
    assert urls == {"https://new.test/x"}  # blocked candidate filtered

    # recrawl-schedule over a two-capture history
    hist_pq = tmp_path / "hist_pq"
    spark.createDataFrame(
        [
            ("https://a.test/1", 1704067200, "v1"),
            ("https://a.test/1", 1704153600, "v2"),
        ],
        "url string, ts long, text string",
    ).select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "text"
    ).write.mode("overwrite").parquet(str(hist_pq))
    rout = tmp_path / "recrawl_out"
    assert main(
        ["--algo", "recrawl-schedule", "--edges", str(hist_pq),
         "--format", "pages", "--output", str(rout)],
        spark=spark,
    ) == 0
    rows = spark.read.parquet(str(rout)).collect()
    assert len(rows) == 1 and rows[0]["recrawl_hours"] >= 1.0


def test_cli_frontier_schedule(spark, tmp_path):
    from pyspark.sql import functions as F

    pages_pq = tmp_path / "pages_sched_pq"
    spark.createDataFrame(
        [
            (
                "https://a.test/1",
                '<html><a href="https://n.test/x">1</a>'
                '<a href="https://n.test/y">2</a>'
                '<a href="https://n.test/y">2b</a></html>',
            ),
        ],
        "url string, html_s string",
    ).select(
        "url", F.encode("html_s", "UTF-8").alias("html")
    ).write.mode("overwrite").parquet(str(pages_pq))
    robots_pq = tmp_path / "robots_sched_pq"
    spark.createDataFrame(
        [("n.test", "User-agent: *\nCrawl-delay: 3")],
        "host string, body string",
    ).write.mode("overwrite").parquet(str(robots_pq))
    out = tmp_path / "sched_out"
    assert main(
        ["--algo", "crawl-frontier", "--edges", str(pages_pq), "--format",
         "pages", "--robots", str(robots_pq), "--schedule",
         "--pagerank-niters", "2", "--output", str(out)],
        spark=spark,
    ) == 0
    got = {
        r["dst_url"]: r["fetch_offset_ms"]
        for r in spark.read.parquet(str(out)).collect()
    }
    # /y has 2 refs -> first (offset 0); /x second at the 3 s delay
    assert got == {"https://n.test/y": 0, "https://n.test/x": 3000}
