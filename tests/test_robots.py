"""robots.txt parsing + frontier politeness filter vs a pure-Python
replay of the documented contract (fog_spark/operators/robots.py)."""

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

# (url, expected allowed) — the Python-side expectations follow the
# module contract: wildcard group only, literal prefixes, $ stripped,
# *-rules dropped, longest match wins, allow wins ties
CASES = [
    ("https://a.test/", True),
    ("https://a.test/private/x", False),
    ("https://a.test/private/ok/x", True),  # longer allow overrides
    ("https://a.test/google-only/x", True),  # per-bot group ignored
    ("https://a.test/tmpfile", False),  # $ stripped -> prefix /tmp
    ("https://a.test/star/a/glob", True),  # *-rule dropped
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
        ("a.test", False, "/tmp"),
        ("b.test", False, "/"),
        ("b.test", True, "/public/"),
        ("c.test", False, "/crlf/"),
    }


def test_frontier_allowed(spark, rules):
    urls = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {r["url"]: r["allowed"] for r in frontier_allowed(urls, rules).collect()}
    for url, want in CASES:
        assert got[url] == want, url


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
