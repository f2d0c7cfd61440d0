"""Sitemap parsing + frontier seed injection (fog_spark/operators/sitemaps.py)."""

from fog_spark.operators.sitemaps import parse_sitemaps, sitemap_frontier_seeds

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.test/p/1</loc>
    <lastmod>2026-01-05</lastmod>
  </url>
  <url><loc><![CDATA[https://a.test/p/2]]></loc></url>
  <url>
    <loc>
      https://a.test/p/3
    </loc>
    <lastmod>2026-02-01T10:00:00Z</lastmod>
  </url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.test/sitemap-1.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
  <sitemap><loc>https://a.test/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def _sitemaps(spark):
    return spark.createDataFrame(
        [
            ("https://a.test/sitemap.xml", URLSET),
            ("https://a.test/sitemap_index.xml", INDEX),
        ],
        "sitemap_url string, body string",
    )


def test_parse_urlset_and_index(spark):
    rows = parse_sitemaps(_sitemaps(spark)).collect()
    got = {(r["kind"], r["url"]): r["lastmod"] for r in rows}
    assert got == {
        ("url", "https://a.test/p/1"): "2026-01-05",
        ("url", "https://a.test/p/2"): None,
        ("url", "https://a.test/p/3"): "2026-02-01T10:00:00Z",
        ("index", "https://a.test/sitemap-1.xml"): "2026-01-01",
        ("index", "https://a.test/sitemap-2.xml"): None,
    }
    # the loc-less <url> block contributes nothing
    assert len(rows) == 5


def test_frontier_seeds_anti_join(spark):
    crawled = spark.createDataFrame(
        [("https://a.test/p/1",)], "url string"
    )
    seeds = {
        r["url"]: (r["lastmod"], r["host"])
        for r in sitemap_frontier_seeds(_sitemaps(spark), crawled).collect()
    }
    # crawled p/1 excluded; index entries excluded; host extracted
    assert seeds == {
        "https://a.test/p/2": (None, "a.test"),
        "https://a.test/p/3": ("2026-02-01T10:00:00Z", "a.test"),
    }


def test_frontier_seeds_canonicalize_both_sides(spark):
    # ADVICE r03: an already-crawled page stored with a different spelling
    # (uppercase host, default port) must not re-enter the frontier; and
    # non-canonical <loc> entries collapse to one canonical seed
    from fog_spark.operators.sitemaps import sitemap_frontier_seeds

    body = (
        "<urlset>"
        "<url><loc>https://A.test:443/p/1</loc></url>"
        "<url><loc>https://a.test/p/2</loc></url>"
        "<url><loc>https://A.TEST/p/2</loc></url>"
        "</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("https://a.test/sitemap.xml", body)], "sitemap_url string, body string"
    )
    crawled = spark.createDataFrame(
        [("https://A.test:443/p/1",)], "url string"
    )
    seeds = [r["url"] for r in sitemap_frontier_seeds(sitemaps, crawled).collect()]
    # p/1 is crawled (under its canonical form); both p/2 spellings
    # collapse to ONE canonical seed
    assert seeds == ["https://a.test/p/2"]
