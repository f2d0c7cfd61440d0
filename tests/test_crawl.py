"""Crawl-frontier prioritization (fog_spark.operators.crawl)."""

from pyspark.sql import functions as F

from fog_spark.operators.crawl import crawl_frontier

SF = "/root/testdata/sf0.001"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


def test_frontier_excludes_crawled_and_counts(spark):
    rows = [
        (
            "https://a.test/1",
            # links: one crawled page (excluded), one new url twice,
            # one nofollow new url (excluded)
            '<html><body><a href="https://a.test/2">in</a>'
            '<a href="https://new.test/x">n1</a>'
            '<a href="https://new.test/x">n2</a>'
            '<a rel="nofollow" href="https://spam.test/y">s</a></body></html>',
        ),
        (
            "https://a.test/2",
            '<html><body><a href="https://new.test/z">n3</a></body></html>',
        ),
    ]
    out = {r["dst_url"]: r for r in crawl_frontier(_pages(spark, rows), niters=2).collect()}
    assert set(out) == {"https://new.test/x", "https://new.test/z"}
    assert out["https://new.test/x"]["n_refs"] == 2
    assert out["https://new.test/z"]["n_refs"] == 1
    assert all(r["host"] == "new.test" for r in out.values())
    # new.test receives links but has no outgoing pages in the crawl ->
    # it IS a vertex of the host graph, so it carries a real rank
    assert all(r["host_rank_milli"] > 0 for r in out.values())


def test_frontier_per_host_cap_and_order(spark):
    # one host, three candidates with n_refs 3/2/1 -> cap keeps top 2
    html = (
        '<html><body>'
        '<a href="https://h.test/a">1</a><a href="https://h.test/a">2</a>'
        '<a href="https://h.test/a">3</a>'
        '<a href="https://h.test/b">4</a><a href="https://h.test/b">5</a>'
        '<a href="https://h.test/c">6</a></body></html>'
    )
    pages = _pages(spark, [("https://src.test/p", html)])
    capped = crawl_frontier(pages, niters=2, per_host_cap=2).collect()
    kept = {r["dst_url"] for r in capped}
    assert kept == {"https://h.test/a", "https://h.test/b"}


def test_frontier_real_testdata(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = d.count()
    k = F.col("doc_id").cast("long")
    # every page links the true url of doc (k+5) mod n (crawled;
    # doc_ids are dense 0..n-1) and one never-crawled url on a
    # rotating host
    nxt = (k + 5) % n
    html = F.concat(
        F.lit('<html><body><a href="https://h'), (nxt % 5).cast("string"),
        F.lit(".test/p/"), nxt.cast("string"),
        F.lit('">a</a><a href="https://ext'), (k % 3).cast("string"),
        F.lit(".test/new/"), (k % 50).cast("string"),
        F.lit('">b</a></body></html>'),
    )
    pages = d.select(
        F.concat(F.lit("https://h"), (k % 5).cast("string"),
                 F.lit(".test/p/"), k.cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    out = crawl_frontier(pages, niters=2).collect()
    # ext hosts never appear as page urls: 3 hosts x 50 paths
    assert {r["host"] for r in out} == {"ext0.test", "ext1.test", "ext2.test"}
    assert len(out) == 150
    assert sum(r["n_refs"] for r in out) == d.count()


def test_frontier_canonicalizes_crawled_side(spark):
    # a crawled page stored with a non-canonical spelling must not
    # re-enter the frontier when links to it canonicalize differently
    rows = [
        (
            "https://Host.test:443/x",
            '<html><body><a href="https://other.test/new">n</a></body></html>',
        ),
        (
            "https://other.test/seed",
            '<html><body><a href="https://host.test/x">back</a></body></html>',
        ),
    ]
    out = {r["dst_url"] for r in crawl_frontier(_pages(spark, rows), niters=2).collect()}
    assert out == {"https://other.test/new"}


def test_url_template_and_trap_candidates(spark):
    from fog_spark.operators.crawl import trap_candidates, url_template

    urls = (
        [f"https://cal.test/day/2024/{i}?sess=abc{i}" for i in range(50)]
        + [f"https://ok.test/about/{w}" for w in ("team", "jobs", "press")]
        + ["https://hex.test/id/deadbeefcafe1234"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "dst_url string")
    t = {
        r["dst_url"]: r["t"]
        for r in df.select("dst_url", url_template(F.col("dst_url")).alias("t")).collect()
    }
    assert t["https://cal.test/day/2024/7?sess=abc7"] == "cal.test/day/N/N?sess="
    assert t["https://ok.test/about/team"] == "ok.test/about/team"
    assert t["https://hex.test/id/deadbeefcafe1234"] == "hex.test/id/H"
    traps = trap_candidates(df, min_urls=10).collect()
    assert len(traps) == 1
    assert traps[0]["template"] == "cal.test/day/N/N?sess="
    assert traps[0]["n_urls"] == 50
    assert traps[0]["sample_url"] == "https://cal.test/day/2024/0?sess=abc0"


def test_url_template_keeps_numbered_hosts_distinct(spark):
    # cdn1/cdn2 mirror shards must NOT merge into one template — a trap
    # verdict is per-host or subtracting it drops every mirror at once
    from fog_spark.operators.crawl import url_template

    df = spark.createDataFrame(
        [("https://cdn1.test/img/42.jpg",), ("https://cdn2.test/img/42.jpg",)],
        "dst_url string",
    )
    t = sorted(
        r["t"] for r in df.select(url_template(F.col("dst_url")).alias("t")).collect()
    )
    assert t == ["cdn1.test/img/N.jpg", "cdn2.test/img/N.jpg"]


def test_frontier_plan_composition(spark):
    # the composed fetch-queue plan: sitemap seeds respect robots and the
    # crawled/planned anti-joins; trap templates vanish plan-wide
    from fog_spark.operators.crawl import frontier_plan
    from fog_spark.operators.robots import parse_robots
    from fog_spark.sources.pages import generate_pages
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 150).where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") < 120
    )
    first = pages.orderBy("url").first()["url"]  # an actually-crawled url
    host = first.split("/")[2]
    # a sitemap declaring one crawled page, one frontier-new page, and
    # one robots-blocked page
    body = (
        f"<urlset><url><loc>{first}</loc></url>"
        f"<url><loc>https://{host}/fresh/a</loc></url>"
        f"<url><loc>https://{host}/blocked/b</loc></url></urlset>"
    )
    sitemaps = spark.createDataFrame(
        [(f"https://{host}/sitemap.xml", body)], "sitemap_url string, body string"
    )
    robots = spark.createDataFrame(
        [(host, "User-agent: *\nDisallow: /blocked/*")], "host string, body string"
    )
    plan = frontier_plan(
        pages, robots_rules=parse_robots(robots), sitemaps=sitemaps,
        niters=2, resolve=False,
    )
    rows = plan.collect()
    by_url = {r["url"]: r for r in rows}
    assert f"https://{host}/fresh/a" in by_url
    assert by_url[f"https://{host}/fresh/a"]["via"] == "sitemap"
    assert first not in by_url  # crawled
    assert f"https://{host}/blocked/b" not in by_url  # robots applies to seeds
    assert len(rows) == len(by_url)  # urls unique across link+sitemap
    # every link row matches the plain crawl_frontier output
    links = {r["url"] for r in rows if r["via"] == "link"}
    base = {
        r["dst_url"]
        for r in crawl_frontier(
            pages, niters=2, resolve=False, robots_rules=parse_robots(robots)
        ).collect()
    }
    assert links == base

    # trap subtraction: plant a template family bigger than the threshold
    # via pages that link to /cal?d=N — all of it must leave the plan
    did = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    trap_html = F.concat(
        F.lit('<html><body><a href="https://'), F.lit(host),
        F.lit("/cal?d="), did.cast("string"), F.lit('">t</a></body></html>'),
    )
    tpages = pages.select("url", F.encode(trap_html, "UTF-8").alias("html"))
    with_trap = frontier_plan(
        tpages, niters=2, resolve=False, trap_min_urls=50,
    )
    urls = [r["url"] for r in with_trap.collect()]
    assert not any("/cal?d=" in u for u in urls)
    without_cap = frontier_plan(tpages, niters=2, resolve=False)
    assert any("/cal?d=" in r["url"] for r in without_cap.collect())


def test_frontier_redirect_collapse(spark):
    """With a redirect map: an alias of a crawled page never re-enters
    the queue, and aliases of one uncrawled page merge their n_refs."""
    rows = [
        (
            "https://a.test/1",
            # old.test/m redirects to the CRAWLED a.test/2 -> excluded;
            # amp.new.test/x and new.test/x are aliases of the same
            # uncrawled terminal -> one candidate, n_refs merged
            '<html><body><a href="https://old.test/m">r</a>'
            '<a href="https://amp.new.test/x">a1</a>'
            '<a href="https://new.test/x">a2</a></body></html>',
        ),
        ("https://a.test/2", "<html><body>crawled target</body></html>"),
    ]
    redirects = spark.createDataFrame(
        [
            ("https://old.test/m", "https://a.test/2"),
            ("https://amp.new.test/x", "https://new.test/x"),
        ],
        "url string, target string",
    )
    out = {
        r["dst_url"]: r
        for r in crawl_frontier(
            _pages(spark, rows), niters=2, redirects=redirects
        ).collect()
    }
    assert set(out) == {"https://new.test/x"}
    assert out["https://new.test/x"]["n_refs"] == 2
    # without the map, the alias and the redirect-to-crawled both queue
    base = {
        r["dst_url"]
        for r in crawl_frontier(_pages(spark, rows), niters=2).collect()
    }
    assert base == {
        "https://old.test/m", "https://amp.new.test/x", "https://new.test/x",
    }


def test_schedule_fetches_per_host_spacing(spark):
    from fog_spark.operators.crawl import schedule_fetches

    frontier = spark.createDataFrame(
        [
            ("https://a.test/1", "a.test", 5, 900),
            ("https://a.test/2", "a.test", 9, 900),  # more refs -> earlier
            ("https://b.test/1", "b.test", 1, 100),
        ],
        "dst_url string, host string, n_refs long, host_rank_milli long",
    )
    delays = spark.createDataFrame(
        [("a.test", 2.5)], "host string, delay_s double"
    )
    got = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, delays, default_delay_s=1.0).collect()
    }
    # a.test: /2 first (n_refs 9) at 0, /1 at 2500ms; b.test default 1s
    assert got == {
        "https://a.test/2": 0,
        "https://a.test/1": 2500,
        "https://b.test/1": 0,
    }
    # no delays frame at all -> default spacing
    got2 = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, default_delay_s=0.25).collect()
    }
    assert got2["https://a.test/1"] == 250


def test_schedule_fetches_hostile_delay_and_keep_cols(spark):
    """A hostile Crawl-delay (1e18) must clamp, not abort the job under
    ANSI; keep_cols annotates the frontier in place with identical
    offsets (review findings)."""
    from fog_spark.operators.crawl import MAX_CRAWL_DELAY_S, schedule_fetches

    frontier = spark.createDataFrame(
        [
            ("https://evil.test/a", "evil.test", 2, 500),
            ("https://evil.test/b", "evil.test", 1, 500),
        ],
        "dst_url string, host string, n_refs long, host_rank_milli long",
    )
    delays = spark.createDataFrame(
        [("evil.test", 1e18)], "host string, delay_s double"
    )
    got = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, delays).collect()
    }
    assert got["https://evil.test/b"] == int(MAX_CRAWL_DELAY_S * 1000)
    kept_df = schedule_fetches(frontier, delays, keep_cols=True)
    assert {f.name for f in kept_df.schema.fields} == {
        "dst_url", "host", "n_refs", "host_rank_milli", "fetch_offset_ms"
    }
    assert {r["dst_url"]: r["fetch_offset_ms"] for r in kept_df.collect()} == {
        "https://evil.test/a": 0,
        "https://evil.test/b": int(MAX_CRAWL_DELAY_S * 1000),
    }
    # NULL or negative delay rows fall to the DEFAULT, not the clamp
    # ceiling or a backwards timeline (review findings)
    bad = spark.createDataFrame(
        [("evil.test", None), ("x.test", -5.0)], "host string, delay_s double"
    )
    got_bad = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, bad, default_delay_s=1.0).collect()
    }
    assert got_bad["https://evil.test/b"] == 1000
    got_negd = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, None, default_delay_s=-3.0).collect()
    }
    assert got_negd["https://evil.test/b"] == 0  # negative default floors at 0
    # NaN joins NULL/negative in defaulting: Spark orders NaN ABOVE 0,
    # so without the isnan guard a NaN delay would clamp to the ceiling
    # instead of falling through to the default (advice finding)
    nan = spark.createDataFrame(
        [("evil.test", float("nan"))], "host string, delay_s double"
    )
    got_nan = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, nan, default_delay_s=1.0).collect()
    }
    assert got_nan["https://evil.test/b"] == 1000
    # a NaN row must not MASK a valid one through the per-host max
    # (Spark orders NaN above every number): the host keeps its largest
    # VALID delay, not the default (review finding)
    mixed = spark.createDataFrame(
        [("evil.test", 30.0), ("evil.test", float("nan")),
         ("evil.test", -4.0)],
        "host string, delay_s double",
    )
    got_mixed = {
        r["url"]: r["fetch_offset_ms"]
        for r in schedule_fetches(frontier, mixed, default_delay_s=1.0).collect()
    }
    assert got_mixed["https://evil.test/b"] == 30_000
