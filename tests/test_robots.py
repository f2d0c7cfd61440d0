"""robots.txt parsing + frontier politeness filter vs a pure-Python
replay of the RFC 9309 contract (fog_spark/operators/robots.py)."""

import pytest
from pyspark.sql import functions as F

from fog_spark.operators.robots import frontier_allowed, parse_robots

ROBOTS = {
    "a.test": """
# comment line
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp$
Disallow: /star/*/glob
Disallow:
""",
    "b.test": """
User-agent: fetchbot
User-agent: *
Disallow: /
Allow: /public/
""",
    "c.test": "User-agent: *\r\nDisallow: /crlf/\r\n",
    "d.test": "total garbage\nno directives here",
}

# (url, expected allowed) under RFC 9309 semantics: wildcard group (no
# agent given), '*' matches any run, trailing '$' anchors, longest rule
# value wins, allow wins ties
CASES = [
    ("https://a.test/", True),
    ("https://a.test/private/x", False),
    ("https://a.test/private/ok/x", True),  # longer allow overrides
    ("https://a.test/google-only/x", True),  # per-bot group ignored w/o agent
    ("https://a.test/tmpfile", True),  # $ anchors: /tmp$ != /tmpfile
    ("https://a.test/tmp", False),  # ... but matches /tmp exactly
    ("https://a.test/star/a/glob", False),  # *-rule now matches
    ("https://a.test/star/a/b/glob2", False),  # * spans slashes, prefix match
    ("https://b.test/anything", False),  # / disallows all ...
    ("https://b.test/public/x", True),  # ... except the allow carve-out
    ("https://c.test/crlf/x", False),  # CRLF bodies parse
    ("https://c.test/other", True),
    ("https://d.test/x", True),  # no rules -> allowed
    ("https://nobody.test/x", True),  # host without robots -> allowed
]


@pytest.fixture(scope="module")
def rules(spark):
    robots = spark.createDataFrame(
        [(h, b) for h, b in ROBOTS.items()], "host string, body string"
    )
    return parse_robots(robots)


def test_parse_rules(spark, rules):
    got = {(r["host"], r["allow"], r["prefix"]) for r in rules.collect()}
    assert got == {
        ("a.test", False, "/private/"),
        ("a.test", True, "/private/ok/"),
        ("a.test", False, "/tmp$"),
        ("a.test", False, "/star/*/glob"),
        ("b.test", False, "/"),
        ("b.test", True, "/public/"),
        ("c.test", False, "/crlf/"),
    }


def test_frontier_allowed(spark, rules):
    urls = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {r["url"]: r["allowed"] for r in frontier_allowed(urls, rules).collect()}
    for url, want in CASES:
        assert got[url] == want, url


def test_named_agent_group(spark):
    # RFC 9309 §2.2.1: exact (case-insensitive) product-token match; a
    # matching named group REPLACES the * group entirely, even when the
    # named group is empty (allow-all, not fallback)
    robots = spark.createDataFrame(
        [
            (
                "a.test",
                "User-agent: FetchBot\nDisallow: /fb/\n\n"
                "User-agent: *\nDisallow: /all/\n",
            ),
            # NB: blank lines do NOT close a group in RFC 9309 — the empty
            # Disallow does (and itself contributes no rule)
            ("empty.test", "User-agent: fetchbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"),
        ],
        "host string, body string",
    )
    named = parse_robots(robots, agent="fetchbot")
    got = {(r["host"], r["allow"], r["prefix"]) for r in named.collect()}
    # a.test: only the named group's rule; empty.test: named group is
    # empty -> NO rules (the Disallow:/ of * must not leak in)
    assert got == {("a.test", False, "/fb/")}
    urls = spark.createDataFrame(
        [("https://a.test/fb/x",), ("https://a.test/all/x",), ("https://empty.test/x",)],
        "url string",
    )
    allowed = {
        r["url"]: r["allowed"] for r in frontier_allowed(urls, named).collect()
    }
    assert allowed == {
        "https://a.test/fb/x": False,
        "https://a.test/all/x": True,  # * group ignored for named agent
        "https://empty.test/x": True,  # empty named group = allow-all
    }


def test_rfc9309_wildcard_examples(spark):
    # the published example set (RFC 9309 §2.2.2/§5.2 longest-match +
    # Google's documented wildcard examples): each case is (body, path,
    # expected allowed)
    cases = [
        # /fish* matches /fish, /fishheads, /fish/salmon.html
        ("User-agent: *\nDisallow: /fish*", "/fish", False),
        ("User-agent: *\nDisallow: /fish*", "/fishheads/yummy.html", False),
        ("User-agent: *\nDisallow: /fish*", "/fish/salmon.html", False),
        ("User-agent: *\nDisallow: /fish*", "/Fish.asp", True),  # case-sensitive
        ("User-agent: *\nDisallow: /fish*", "/catfish", True),  # anchored at start
        # /*.php$ matches /filename.php, /folder/filename.php, but not
        # /filename.php?parameters or /filename.php5
        ("User-agent: *\nDisallow: /*.php$", "/filename.php", False),
        ("User-agent: *\nDisallow: /*.php$", "/folder/filename.php", False),
        ("User-agent: *\nDisallow: /*.php$", "/filename.php?parameters", True),
        ("User-agent: *\nDisallow: /*.php$", "/filename.php5", True),
        # longest match: allow /p beats disallow / for /page
        ("User-agent: *\nAllow: /p\nDisallow: /", "/page", True),
        ("User-agent: *\nAllow: /p\nDisallow: /", "/index.html", False),
        # equal length: allow wins the tie
        ("User-agent: *\nAllow: /folder\nDisallow: /folder", "/folder/page", True),
        # /page (5) vs /*.htm (6): the longer (wildcard) rule wins — the
        # published example: /page.htm is blocked despite Allow: /page
        ("User-agent: *\nAllow: /page\nDisallow: /*.htm", "/page.htm", False),
        ("User-agent: *\nAllow: /page\nDisallow: /*.html", "/page", True),
        # $ mid-pattern is literal
        ("User-agent: *\nDisallow: /a$b", "/a$b/c", False),
        ("User-agent: *\nDisallow: /a$b", "/ab", True),
        # regex metachars in rules are literal
        ("User-agent: *\nDisallow: /a.b", "/axb", True),
        ("User-agent: *\nDisallow: /a.b", "/a.b", False),
        ("User-agent: *\nDisallow: /q(1)+", "/q(1)+x", False),
    ]
    robots = spark.createDataFrame(
        [(f"h{i}.test", body) for i, (body, _, _) in enumerate(cases)],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [(f"https://h{i}.test{path}",) for i, (_, path, _) in enumerate(cases)],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in frontier_allowed(urls, parse_robots(robots)).collect()
    }
    for i, (body, path, want) in enumerate(cases):
        assert got[f"https://h{i}.test{path}"] == want, (body, path)


def test_pct_encoding_equivalence(spark):
    # RFC 9309 §2.2.2: matching is on normalized octets — hex case is
    # insignificant, unreserved octets compare equal encoded or not,
    # reserved octets (%2F) keep their encoded spelling and stay
    # distinct from the literal character.
    cases = [
        # hex case equivalence both directions
        ("User-agent: *\nDisallow: /a%3cd.html", "/a%3Cd.html", False),
        ("User-agent: *\nDisallow: /a%3Cd.html", "/a%3cd.html", False),
        # unreserved octet: encoded rule matches literal path and back
        ("User-agent: *\nDisallow: /f%7Eb", "/f~b", False),
        ("User-agent: *\nDisallow: /f~b", "/f%7eb", False),
        ("User-agent: *\nDisallow: /%61bc", "/abc", False),
        # reserved %2F stays encoded: does NOT match a literal slash...
        ("User-agent: *\nDisallow: /a%2Fb", "/a/b", True),
        # ...but matches the (case-folded) encoded spelling
        ("User-agent: *\nDisallow: /a%2Fb", "/a%2fb", False),
        # a bare % not opening a triplet is literal
        ("User-agent: *\nDisallow: /100%", "/100%off", False),
        ("User-agent: *\nDisallow: /100%", "/100", True),
        # %2A is an encoded asterisk, NOT a wildcard
        ("User-agent: *\nDisallow: /x%2Ay", "/xZy", True),
        ("User-agent: *\nDisallow: /x%2Ay", "/x%2ay", False),
        # normalization composes with wildcards/anchors
        ("User-agent: *\nDisallow: /*%7E$", "/dir/%7e", False),
        ("User-agent: *\nDisallow: /*%7E$", "/dir/~x", True),
    ]
    robots = spark.createDataFrame(
        [(f"h{i}.test", body) for i, (body, _, _) in enumerate(cases)],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [(f"https://h{i}.test{path}",) for i, (_, path, _) in enumerate(cases)],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in frontier_allowed(urls, parse_robots(robots)).collect()
    }
    for i, (body, path, want) in enumerate(cases):
        assert got[f"https://h{i}.test{path}"] == want, (body, path)


def test_extra_columns_survive(spark, rules):
    urls = spark.createDataFrame(
        [("https://a.test/private/x", 7), ("https://a.test/fine", 9)],
        "url string, score long",
    )
    got = {r["url"]: (r["score"], r["allowed"]) for r in frontier_allowed(urls, rules).collect()}
    assert got == {
        "https://a.test/private/x": (7, False),
        "https://a.test/fine": (9, True),
    }


def test_duplicate_rows_and_colliding_names_survive(spark, rules):
    # ADVICE r03: frontier_allowed used to groupBy(*urls.columns), which
    # collapsed duplicate rows and broke on inputs carrying columns named
    # like the rule table's. Row-keyed grouping keeps both.
    urls = spark.createDataFrame(
        [
            ("https://a.test/private/x", True, "z"),
            ("https://a.test/private/x", True, "z"),  # exact duplicate
            ("https://a.test/fine", False, "y"),
        ],
        "url string, allow boolean, prefix string",
    )
    rows = frontier_allowed(urls, rules).collect()
    assert len(rows) == 3
    got = sorted((r["url"], r["allow"], r["prefix"], r["allowed"]) for r in rows)
    assert got == [
        ("https://a.test/fine", False, "y", True),
        ("https://a.test/private/x", True, "z", False),
        ("https://a.test/private/x", True, "z", False),
    ]


def test_crawl_frontier_respects_robots(spark, rules):
    from fog_spark.operators.crawl import crawl_frontier
    from fog_spark.sources.pages import generate_pages

    # crawl only the first 150 of 200 fixture pages so links to the last
    # 50 form a non-empty frontier; then disallow one candidate's path
    # via a wildcard rule and verify it leaves the frontier
    pages = generate_pages(spark, 200).where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") < 150
    )
    base = crawl_frontier(pages, niters=2, resolve=False)
    target = base.orderBy("dst_url").limit(1).collect()[0]
    host, url = target["host"], target["dst_url"]
    path = url.split(host, 1)[1]
    robots = spark.createDataFrame(
        [(host, f"User-agent: *\nDisallow: {path}")], "host string, body string"
    )
    filt = crawl_frontier(
        pages, niters=2, resolve=False, robots_rules=parse_robots(robots)
    )
    kept = {r["dst_url"] for r in filt.collect()}
    assert url not in kept
    assert kept == {r["dst_url"] for r in base.collect()} - {url}


def test_sitemap_urls_discovery(spark):
    """Sitemap: directives are cross-group, case-insensitive, repeated
    declarations collapse, comments strip, non-directive lines ignored."""
    from fog_spark.operators.robots import sitemap_urls

    body = "\r\n".join(
        [
            "User-agent: *",
            "Disallow: /private/",
            "sitemap: https://h.test/sitemap.xml  # comment",
            "User-agent: fetchbot",
            "Allow: /",
            "SITEMAP: https://h.test/news-sitemap.xml",
            "Sitemap: https://h.test/sitemap.xml",  # duplicate
            "random junk line",
        ]
    )
    robots = spark.createDataFrame([("h.test", body)], "host string, body string")
    got = {
        (r["host"], r["sitemap_url"]) for r in sitemap_urls(robots).collect()
    }
    assert got == {
        ("h.test", "https://h.test/sitemap.xml"),
        ("h.test", "https://h.test/news-sitemap.xml"),
    }


def test_crawl_delays_group_selection(spark):
    from fog_spark.operators.robots import crawl_delays

    body = "\n".join([
        "User-agent: *",
        "Crawl-delay: 2",
        "Disallow: /x",
        "User-agent: fetchbot",
        "Crawl-delay: 0.5",
        "User-agent: otherbot",
        "Crawl-delay: 30",
    ])
    # named group wins for fetchbot; * group for unnamed agents
    robots = spark.createDataFrame([("h.test", body)], "host string, body string")
    star = {r["host"]: r["delay_s"] for r in crawl_delays(robots).collect()}
    assert star == {"h.test": 2.0}
    named = {
        r["host"]: r["delay_s"]
        for r in crawl_delays(robots, agent="FetchBot").collect()
    }
    assert named == {"h.test": 0.5}
    # a matching named group WITHOUT a delay replaces * entirely -> no row
    body2 = "User-agent: *\nCrawl-delay: 9\nUser-agent: fetchbot\nAllow: /"
    r2 = spark.createDataFrame([("h2.test", body2)], "host string, body string")
    assert crawl_delays(r2, agent="fetchbot").collect() == []
    # junk values ignored; last valid delay wins; negatives dropped
    body3 = "User-agent: *\nCrawl-delay: soon\nCrawl-delay: 4\nCrawl-delay: 7"
    r3 = spark.createDataFrame([("h3.test", body3)], "host string, body string")
    assert {r["delay_s"] for r in crawl_delays(r3).collect()} == {7.0}
    # a negative AFTER a valid delay is ignored, not an eraser (review
    # finding): the host keeps 4, it does not fall to the default
    body4 = "User-agent: *\nCrawl-delay: 4\nCrawl-delay: -2"
    r4 = spark.createDataFrame([("h4.test", body4)], "host string, body string")
    assert {r["delay_s"] for r in crawl_delays(r4).collect()} == {4.0}
    # duplicate host captures collapse to ONE row (politest delay)
    r5 = spark.createDataFrame(
        [("h5.test", "User-agent: *\nCrawl-delay: 1"),
         ("h5.test", "User-agent: *\nCrawl-delay: 6")],
        "host string, body string",
    )
    rows5 = crawl_delays(r5).collect()
    assert len(rows5) == 1 and rows5[0]["delay_s"] == 6.0


def test_crawl_delays_nan_and_clamp(spark):
    """'Crawl-delay: NaN' is junk, not a delay: try_cast yields a double
    NaN which Spark orders ABOVE 0, so without its own guard it would
    overwrite an earlier valid delay and then clamp to the ceiling
    (advice finding). And crawl_delays itself clamps hostile magnitudes
    so EVERY consumer sees [0, MAX_CRAWL_DELAY_S], not just
    schedule_fetches (advice finding)."""
    from fog_spark.operators.robots import MAX_CRAWL_DELAY_S, crawl_delays

    # NaN after a valid value is ignored (4 survives); NaN alone -> no row
    body = "User-agent: *\nCrawl-delay: 4\nCrawl-delay: NaN"
    r = spark.createDataFrame([("h.test", body)], "host string, body string")
    assert {x["delay_s"] for x in crawl_delays(r).collect()} == {4.0}
    r2 = spark.createDataFrame(
        [("h2.test", "User-agent: *\nCrawl-delay: NaN")],
        "host string, body string",
    )
    assert crawl_delays(r2).collect() == []
    # hostile magnitudes clamp AT THE SOURCE
    r3 = spark.createDataFrame(
        [("h3.test", "User-agent: *\nCrawl-delay: 1e18"),
         ("h4.test", "User-agent: *\nCrawl-delay: Infinity")],
        "host string, body string",
    )
    got = {x["host"]: x["delay_s"] for x in crawl_delays(r3).collect()}
    assert got == {"h3.test": MAX_CRAWL_DELAY_S, "h4.test": MAX_CRAWL_DELAY_S}


def test_group_boundaries_closed_by_any_directive(spark):
    """A directive that is not a rule still closes a User-agent header
    block: UA a / Disallow / UA b must be TWO groups (review-of-review
    finding — the fold previously only saw kept directives, so the
    unkept kind leaked group membership across)."""
    from fog_spark.operators.robots import crawl_delays, parse_robots

    body = "\n".join([
        "User-agent: alpha",
        "Disallow: /a-only",
        "User-agent: beta",
        "Crawl-delay: 5",
        "Disallow: /b-only",
    ])
    robots = spark.createDataFrame([("h.test", body)], "host string, body string")
    # alpha's group must NOT get beta's delay
    assert crawl_delays(robots, agent="alpha").collect() == []
    assert {r["delay_s"] for r in crawl_delays(robots, agent="beta").collect()} == {5.0}
    # beta's rules must NOT include alpha's (crawl-delay closed nothing
    # extra) and vice versa
    a_rules = {r["prefix"] for r in parse_robots(robots, agent="alpha").collect()}
    b_rules = {r["prefix"] for r in parse_robots(robots, agent="beta").collect()}
    assert a_rules == {"/a-only"} and b_rules == {"/b-only"}
    # uninterrupted UA runs still merge into one group
    body2 = "User-agent: a\nUser-agent: b\nDisallow: /both"
    r2 = spark.createDataFrame([("h2.test", body2)], "host string, body string")
    assert {r["prefix"] for r in parse_robots(r2, agent="a").collect()} == {"/both"}
    assert {r["prefix"] for r in parse_robots(r2, agent="b").collect()} == {"/both"}
