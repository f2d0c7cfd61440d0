"""Sitemap parsing — seed/refresh URL injection for the crawl frontier.

The complement of robots politeness: robots removes what must not be
fetched, sitemaps declare what the site WANTS fetched (sitemaps.org
protocol, public spec). A crawler merges sitemap entries into the
frontier with their declared lastmod so re-crawls prioritize changed
pages; `operators/snapshots.page_change_stats` is the observed-change
counterpart.

Parsing is regexp Column math over the XML body — sitemap XML is a flat
<url><loc/><lastmod/></url> list, and a true XML parser buys nothing for
two leaf tags (the regexps tolerate attribute noise and whitespace;
CDATA in <loc> is unwrapped). Sitemap INDEX files (<sitemapindex> of
<sitemap><loc/> children) are recognized and their child sitemap urls
returned with kind='index' — fetching children is the crawler's job
(I/O), not the parser's.

Scale shape: one projection per sitemap row (per-row transform over the
extracted <url> blocks), one explode. A 50k-entry sitemap (the spec
maximum) is a ~10 MB row — within a comfortable task bound; no shuffle
until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CD = r"(?:<!\[CDATA\[)?\s*([^<\s\]]+)\s*(?:\]\]>)?"


def parse_sitemaps(
    sitemaps: DataFrame, body_col: str = "body", src_col: str = "sitemap_url"
) -> DataFrame:
    """(sitemap_url, kind, url, lastmod) — one row per <loc> entry.
    kind = 'url' for page entries, 'index' for child sitemaps of an
    index file; lastmod is the raw string (W3C datetime per spec, but
    crawls contain every format — parsing to timestamp is the caller's
    policy via to_timestamp), null when absent."""
    blocks = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?s)<(?:url|sitemap)[\s>](.*?)</(?:url|sitemap)>"), 1
    )
    is_index = F.col(body_col).rlike(r"<\s*sitemapindex[\s>]")
    entry = lambda b: F.struct(  # noqa: E731
        F.regexp_extract(b, rf"(?s)<loc[^>]*>{_CD}</loc>", 1).alias("url"),
        F.nullif(
            F.regexp_extract(b, rf"(?s)<lastmod[^>]*>{_CD}</lastmod>", 1), F.lit("")
        ).alias("lastmod"),
    )
    return (
        sitemaps.select(
            F.col(src_col).alias("sitemap_url"),
            F.when(is_index, F.lit("index")).otherwise(F.lit("url")).alias("kind"),
            F.explode(F.transform(blocks, entry)).alias("e"),
        )
        .select("sitemap_url", "kind", F.col("e.url").alias("url"), "e.lastmod")
        .where(F.col("url") != "")
    )


def sitemap_frontier_seeds(
    sitemaps: DataFrame,
    crawled: DataFrame,
    body_col: str = "body",
    src_col: str = "sitemap_url",
    crawled_url_col: str = "url",
) -> DataFrame:
    """(url, lastmod, host) — sitemap page entries not yet crawled: the
    seed rows a scheduler unions into crawl_frontier's output (sitemap
    entries carry the site's own declared priority/freshness, so they
    bypass the inlink-count ranking). One anti-join against the crawled
    set; index entries are excluded (fetch them first). BOTH sides are
    canonicalized first (ADVICE r03): an already-crawled page whose
    stored spelling differs from its <loc> spelling (uppercase host,
    default port, trailing slash form) must NOT re-enter the frontier —
    the same guard crawl_frontier applies to its crawled side. The
    returned url is the canonical form."""
    from fog_spark.functions.urlnorm import canonicalize_url
    from fog_spark.operators.hostgraph import host_of

    entries = (
        parse_sitemaps(sitemaps, body_col, src_col)
        .where(F.col("kind") == "url")
        .select(canonicalize_url(F.col("url")).alias("url"), "lastmod")
    )
    return (
        entries.join(
            crawled.select(
                canonicalize_url(F.col(crawled_url_col)).alias("url")
            ),
            "url",
            "left_anti",
        )
        .select("url", "lastmod", host_of(F.col("url")).alias("host"))
        .distinct()
    )
