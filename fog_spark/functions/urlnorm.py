"""Web-link extraction with URL resolution and canonicalization.

The reference's converter consumes pre-built integer edge lists
(/root/reference/convert/process_edgelist.cpp:55-221); a real crawl
pipeline sits one step earlier: anchors in HTML carry *relative* hrefs,
tracking fragments, non-http schemes, and rel="nofollow" hints, and the
same document can be referenced by many spellings of one URL. This
module turns ``<a>`` elements into canonical absolute (src_url, dst_url,
anchor_text, nofollow) rows — the input the page/host graph builders and
any anchor-text training corpus need.

Everything is pure Column expressions (regexp + conditionals inside
whole-stage codegen — the 100 TB path), with an Arrow pandas twin
(:func:`page_links_udf`) pinned equal by tests, mirroring extract.py's
two-path contract (input_hint: vectorized UDFs, no per-row Python).

Semantics (simplified RFC 3986, identical in both paths and in the SQL
oracles):

- href classification: fragment-only / empty -> dropped; explicit
  scheme -> kept only for http/https; ``//host/..`` -> base scheme;
  ``/path`` -> base root; ``?query`` -> base path with the query
  replaced; anything else resolves against the base directory.
- canonicalization: lowercase scheme + host, drop the fragment, strip
  default ports (:80 http, :443 https), remove dot-segments (bounded at
  ``_DOT_ROUNDS`` nesting levels — beyond that depth the residue is
  kept verbatim; crawl URLs nest ``../`` a handful deep at most), empty
  path -> "/".
- ``..`` segments that would escape the root are clamped at the root
  (browser behavior).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one <a ...>...</a> element, single-line or multi-line body
_ANCHOR_RE = r"(?s)<a\s[^>]*>.*?</a>"
_HREF_IN_A = r'href="([^"]*)"'
_NOFOLLOW_IN_A = r'rel="[^"]*\bnofollow\b[^"]*"'
_TEXT_IN_A = r"(?s)<a\s[^>]*>(.*?)</a>"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):"
_ROOT_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

# dot-segment rewrites, applied _DOT_ROUNDS times (bounded loop — a
# Column expression cannot iterate to fixpoint) to the PATH only; the
# query string is split off first so "?next=/a/../b" stays untouched
_DOT_ROUNDS = 4
_DOT_SLASH = r"/\.(?=/|$)"             # "/./" or trailing "/."
_UP_SEG = r"/(?!\.\./)[^/]+/\.\.(?=/|$)"  # "/seg/../" (seg != "..")
# ASCII whitespace, identical on the JVM (Java \s is ASCII-only) and in
# the pandas twin (which must NOT use .str.strip(): Python strips
# Unicode whitespace, Java does not)
_WS_EDGES = r"^[ \t\r\n\f\x0B]+|[ \t\r\n\f\x0B]+$"


def anchors_col(html: Column) -> Column:
    """array<struct<href,anchor,nofollow>> of every ``<a>`` element."""
    elems = F.regexp_extract_all(
        F.decode(html, "UTF-8"), F.lit(_ANCHOR_RE), F.lit(0)
    )
    return F.transform(
        elems,
        lambda a: F.struct(
            F.regexp_extract(a, _HREF_IN_A, 1).alias("href"),
            F.regexp_extract(a, _TEXT_IN_A, 1).alias("anchor"),
            (F.regexp_extract(a, _NOFOLLOW_IN_A, 0) != "").alias("nofollow"),
        ),
    )


def resolve_href(base: Column, href: Column) -> Column:
    """Absolute (un-canonicalized) URL of ``href`` seen on page ``base``,
    or NULL for dropped links (fragment-only, empty, non-http scheme)."""
    h = F.regexp_replace(href, _WS_EDGES, "")
    scheme = F.regexp_extract(h, _SCHEME_RE, 1)
    base_scheme = F.regexp_extract(base, _SCHEME_RE, 1)
    base_root = F.regexp_extract(base, _ROOT_RE, 1)
    # base with query/fragment dropped, then everything after the last
    # path slash dropped; a rootless base ("https://h.test") gets "/"
    base_path = F.regexp_replace(base, r"[?#].*$", "")
    base_dir = F.when(
        F.regexp_extract(base_path, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*$", 0)
        != "",
        F.concat(base_path, F.lit("/")),
    ).otherwise(F.regexp_replace(base_path, r"[^/]*$", ""))
    return (
        F.when((h == "") | h.startswith("#"), F.lit(None).cast("string"))
        .when(
            scheme != "",
            F.when(F.lower(scheme).isin("http", "https"), h).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .when(h.startswith("//"), F.concat(base_scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(base_root, h))
        # query-only ref: replace the base query, keep the full path
        # (RFC 3986 5.3: ref with query but no path)
        .when(h.startswith("?"), F.concat(base_path, h))
        .otherwise(F.concat(base_dir, h))
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc)."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    rest = F.regexp_replace(u, r"^[^:]+://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_replace(rest, r"^[^?]*", "")
    for _ in range(_DOT_ROUNDS):
        path = F.regexp_replace(path, _DOT_SLASH, "")
        path = F.regexp_replace(path, _UP_SEG, "")
    # "/../" left at the root escapes it: clamp (browser behavior)
    for _ in range(_DOT_ROUNDS):
        path = F.regexp_replace(path, r"^/\.\.(?=/|$)", "")
    path = F.when(path.startswith("/"), path).otherwise(F.concat(F.lit("/"), path))
    rest = F.concat(path, query)
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def page_links(pages: DataFrame, follow_only: bool = False) -> DataFrame:
    """(url, dst_url, anchor, nofollow) — every kept link, resolved and
    canonicalized. ``follow_only`` drops rel="nofollow" rows (what a
    PageRank-for-crawl-prioritization ingest wants).

    Same semantics as ``canonicalize_url(resolve_href(url, href))``, but
    STAGED through materialized intermediate columns: composing the two
    Column helpers copies every reused subtree into each reference
    (``h`` 7x inside resolve, the whole resolved tree 5x inside
    canonicalize, ``hostport`` 5x, ...), which blows the generated
    projection past the JVM's 64 KB method limit — Janino throws "Code
    grows beyond 64 KB" and Spark silently falls back to interpreted
    projection, which then re-evaluates those duplicated regex subtrees
    per row. Each select below aliases every value referenced more than
    once downstream; CollapseProject keeps non-cheap multi-referenced
    aliases as separate projections (SPARK-36718), so each operator's
    code stays small and the whole chain stays inside one
    WholeStageCodegen span. Pinned by tests/test_urlnorm.py (equal to
    the pandas twin AND codegen-clean under fallback-strict confs)."""
    a = pages.select(
        "url", F.explode(anchors_col(F.col("html"))).alias("a")
    ).select(
        "url",
        F.col("a.href").alias("href"),
        F.col("a.anchor").alias("anchor"),
        F.col("a.nofollow").alias("nofollow"),
    )
    h = F.col("_h")
    base_path = F.col("_base_path")
    # resolve_href, staged: _h / _base_path / _scheme / _base_dir are
    # each computed once and referenced as columns
    s = a.select(
        "url", "anchor", "nofollow",
        F.regexp_replace(F.col("href"), _WS_EDGES, "").alias("_h"),
        F.regexp_replace(F.col("url"), r"[?#].*$", "").alias("_base_path"),
    ).select(
        "*",
        F.regexp_extract(h, _SCHEME_RE, 1).alias("_scheme"),
        F.when(
            F.regexp_extract(
                base_path, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*$", 0
            )
            != "",
            F.concat(base_path, F.lit("/")),
        )
        .otherwise(F.regexp_replace(base_path, r"[^/]*$", ""))
        .alias("_base_dir"),
    )
    scheme = F.col("_scheme")
    resolved = (
        F.when((h == "") | h.startswith("#"), F.lit(None).cast("string"))
        .when(
            scheme != "",
            F.when(F.lower(scheme).isin("http", "https"), h).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .when(
            h.startswith("//"),
            F.concat(F.regexp_extract(F.col("url"), _SCHEME_RE, 1), F.lit(":"), h),
        )
        .when(
            h.startswith("/"),
            F.concat(F.regexp_extract(F.col("url"), _ROOT_RE, 1), h),
        )
        .when(h.startswith("?"), F.concat(base_path, h))
        .otherwise(F.concat(F.col("_base_dir"), h))
    )
    # drop dead links HERE, on _resolved, not on dst_url at the end: a
    # final dst_url filter gets substituted down through every staged
    # projection by predicate pushdown (which has no
    # expression-duplication guard, unlike CollapseProject) and
    # re-inlines the whole pipeline into one >64 KB Filter condition.
    # _resolved null is the ONLY null source downstream (regexp_* and
    # concat over non-null inputs never return null), so this filter is
    # exactly dst_url IS NOT NULL.
    s = s.select("url", "anchor", "nofollow", resolved.alias("_resolved")).where(
        F.col("_resolved").isNotNull()
    )
    # canonicalize_url, staged
    s = s.select(
        "*", F.regexp_replace(F.col("_resolved"), r"#.*$", "").alias("_u")
    )
    u = F.col("_u")
    s = s.select(
        "*",
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("_cscheme"),
        F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1)).alias("_hostport"),
        F.regexp_replace(u, r"^[^:]+://[^/?#]*", "").alias("_rest"),
    )
    cscheme, hostport, rest = F.col("_cscheme"), F.col("_hostport"), F.col("_rest")
    host = (
        F.when(
            (cscheme == "http") & hostport.endswith(":80"),
            F.regexp_replace(hostport, r":80$", ""),
        )
        .when(
            (cscheme == "https") & hostport.endswith(":443"),
            F.regexp_replace(hostport, r":443$", ""),
        )
        .otherwise(hostport)
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    for _ in range(_DOT_ROUNDS):
        path = F.regexp_replace(path, _DOT_SLASH, "")
        path = F.regexp_replace(path, _UP_SEG, "")
    for _ in range(_DOT_ROUNDS):
        path = F.regexp_replace(path, r"^/\.\.(?=/|$)", "")
    s = s.select(
        "url", "anchor", "nofollow", "_cscheme",
        host.alias("_host"),
        path.alias("_path"),
        F.regexp_replace(rest, r"^[^?]*", "").alias("_query"),
    )
    p = F.col("_path")
    dst = F.concat(
        F.col("_cscheme"), F.lit("://"), F.col("_host"),
        F.when(p.startswith("/"), p).otherwise(F.concat(F.lit("/"), p)),
        F.col("_query"),
    )
    out = s.select("url", dst.alias("dst_url"), "anchor", "nofollow")
    if follow_only:
        out = out.where(~F.col("nofollow"))
    return out


def page_links_udf(pages: DataFrame) -> DataFrame:
    """Arrow twin of :func:`page_links` (vectorized pandas str kernels,
    no per-row Python beyond the href-classification np.select); pinned
    equal to the native path by tests/test_urlnorm.py."""
    import re

    import numpy as np
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("dst_url", T.StringType()),
            T.StructField("anchor", T.StringType()),
            T.StructField("nofollow", T.BooleanType()),
        ]
    )
    anchor_re = re.compile(_ANCHOR_RE)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            html = pdf["html"].map(lambda b: bytes(b).decode("utf-8"))
            elems = html.map(anchor_re.findall)
            flat = pd.DataFrame(
                {
                    "url": pdf["url"].repeat(elems.str.len()).to_numpy(),
                    "a": np.concatenate(
                        [np.array(e, dtype=object) for e in elems]
                    )
                    if elems.str.len().sum()
                    else np.array([], dtype=object),
                }
            )
            a = flat["a"].astype("string")
            href = (
                a.str.extract(_HREF_IN_A, expand=False)
                .fillna("")
                .str.replace(_WS_EDGES, "", regex=True)
            )
            anchor = a.str.extract(_TEXT_IN_A, expand=False).fillna("")
            nofollow = a.str.contains(_NOFOLLOW_IN_A, regex=True).fillna(False)
            base = flat["url"].astype("string")
            scheme = href.str.extract(_SCHEME_RE, expand=False)
            b_scheme = base.str.extract(_SCHEME_RE, expand=False)
            b_root = base.str.extract(_ROOT_RE, expand=False)
            b_path = base.str.replace(r"[?#].*$", "", regex=True)
            rootless = b_path.str.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*$")
            b_dir = (b_path + "/").where(
                rootless, b_path.str.replace(r"[^/]*$", "", regex=True)
            )
            resolved = pd.Series(
                np.select(
                    [
                        (href == "") | href.str.startswith("#"),
                        scheme.notna() & scheme.str.lower().isin(["http", "https"]),
                        scheme.notna(),
                        href.str.startswith("//"),
                        href.str.startswith("/"),
                        href.str.startswith("?"),
                    ],
                    [None, href, None, b_scheme + ":" + href, b_root + href,
                     b_path + href],
                    default=b_dir + href,
                ),
                index=flat.index,
                dtype="string",
            )
            u = resolved.str.replace(r"#.*$", "", regex=True)
            r_scheme = u.str.extract(_SCHEME_RE, expand=False).str.lower()
            hostport = u.str.extract(r"^[^:]+://([^/?#]*)", expand=False).str.lower()
            hostport = hostport.str.replace(r":80$", "", regex=True).where(
                (r_scheme == "http") & hostport.str.endswith(":80"), hostport
            )
            hostport = hostport.str.replace(r":443$", "", regex=True).where(
                (r_scheme == "https") & hostport.str.endswith(":443"), hostport
            )
            rest = u.str.replace(r"^[^:]+://[^/?#]*", "", regex=True)
            path = rest.str.extract(r"^([^?]*)", expand=False)
            query = rest.str.replace(r"^[^?]*", "", regex=True)
            for _ in range(_DOT_ROUNDS):
                path = path.str.replace(_DOT_SLASH, "", regex=True)
                path = path.str.replace(_UP_SEG, "", regex=True)
            for _ in range(_DOT_ROUNDS):
                path = path.str.replace(r"^/\.\.(?=/|$)", "", regex=True)
            path = path.where(path.str.startswith("/"), "/" + path)
            dst = r_scheme + "://" + hostport + path + query
            out = pd.DataFrame(
                {
                    "url": flat["url"],
                    "dst_url": dst.where(resolved.notna(), None).astype(object),
                    "anchor": anchor,
                    "nofollow": nofollow.astype(bool),
                }
            )
            yield out[out["dst_url"].notna()]

    return pages.select("url", "html").mapInPandas(batches, schema)


def strip_tracking_params(
    url: Column, prefixes: tuple[str, ...] = ("utm_", "fbclid", "gclid", "mc_")
) -> Column:
    """Remove tracking query parameters (by key prefix) from a canonical
    URL — the standard extra dedup step on crawl URLs, where the same
    document is linked under utm_/click-id decorated spellings. Pure
    Column expression: one regexp_replace per prefix plus separator
    cleanup, preserving the order of surviving params; a query left
    empty is dropped entirely. Anchored on '?' / '&' so a legitimate
    param merely *containing* a prefix is untouched."""
    u = url
    for p in prefixes:
        # strip "key=value" (and a trailing "&") when key starts with p
        u = F.regexp_replace(u, rf"(?<=[?&]){p}[^&#=]*=[^&#]*&?", "")
    u = F.regexp_replace(u, r"&$", "")  # dangling separator
    u = F.regexp_replace(u, r"\?$", "")  # emptied query
    return u
