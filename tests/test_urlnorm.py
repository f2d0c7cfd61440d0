"""Web-link resolution/canonicalization (fog_spark.functions.urlnorm).

Hand-written expectations for every classification + canonicalization
branch, native Column path pinned equal to the Arrow pandas twin, and a
run over the real sf0.001 documents-derived pages table.
"""

import pytest
from pyspark.sql import functions as F

from fog_spark.functions.urlnorm import page_links, page_links_udf

SF = "/root/testdata/sf0.001"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )


FIXTURE = [
    # base page with a path two levels deep
    (
        "https://WWW.Example.COM:443/a/b/page.html?x=1",
        "<html><body>"
        '<a href="https://other.test/p">abs</a>'
        '<a href="//CDN.test:80/img">protorel</a>'
        '<a href="/root/doc">rootrel</a>'
        '<a href="sib.html">rel</a>'
        '<a href="../up/./d.html">dots</a>'
        '<a href="../../../esc.html">escape</a>'
        '<a href="#frag">fragonly</a>'
        '<a href="">empty</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="ftp://f.test/x">ftp</a>'
        '<a rel="nofollow" href="https://spam.test/">nf</a>'
        '<a href="HTTP://UP.test:80/Q#sec">upper</a>'
        "</body></html>",
    ),
    # rootless base
    ("https://h.test", '<html><body><a href="x/y.html">r</a></body></html>'),
]

# (src, dst, anchor, nofollow)
EXPECTED = [
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://other.test/p", "abs", False),
    # //host: base scheme https, but port :80 is NOT default for https -> kept
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://cdn.test:80/img", "protorel", False),
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://www.example.com/root/doc", "rootrel", False),
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://www.example.com/a/b/sib.html", "rel", False),
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://www.example.com/a/up/d.html", "dots", False),
    # ../../../ from /a/b/ escapes the root -> clamped at root
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://www.example.com/esc.html", "escape", False),
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "https://spam.test/", "nf", True),
    ("https://WWW.Example.COM:443/a/b/page.html?x=1", "http://up.test/Q", "upper", False),
    ("https://h.test", "https://h.test/x/y.html", "r", False),
]


def test_page_links_branches(spark):
    got = sorted(
        tuple(r) for r in page_links(_pages(spark, FIXTURE)).collect()
    )
    assert got == sorted(EXPECTED)


def test_follow_only_drops_nofollow(spark):
    got = page_links(_pages(spark, FIXTURE), follow_only=True).collect()
    assert all(not r["nofollow"] for r in got)
    assert len(got) == len(EXPECTED) - 1


def test_udf_twin_matches_native(spark):
    pages = _pages(spark, FIXTURE)
    native = sorted(tuple(r) for r in page_links(pages).collect())
    twin = sorted(tuple(r) for r in page_links_udf(pages).collect())
    assert native == twin


def test_real_testdata_pages(spark):
    # pages synthesized from the real documents parquet (messy hrefs
    # planted formulaically, like the gate's host_pagerank4 pages)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    did = F.col("doc_id").cast("long")
    html = F.concat(
        F.lit('<html><body><a href="/p/'),
        (did * 7).cast("string"),
        F.lit('">a</a><a href="../q/'),
        (did * 3).cast("string"),
        F.lit('.html">b</a><a rel="nofollow" href="#top">c</a></body></html>'),
    )
    pages = d.select(
        F.concat(
            F.lit("https://H"), (did % 11).cast("string"),
            F.lit(".test:443/d/"), did.cast("string"), F.lit("/index.html"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    n_docs = pages.count()
    out = page_links(pages)
    rows = out.collect()
    # fragment-only anchor dropped -> exactly 2 links per page
    assert len(rows) == 2 * n_docs
    assert all(r["dst_url"].startswith("https://h") for r in rows)
    # ../q/ resolves one level up from /d/<id>/ -> /d/q/<3*id>.html
    b = [r for r in rows if r["anchor"] == "b"]
    assert all("/d/q/" in r["dst_url"] for r in b)
    # :443 stripped everywhere
    assert all(":443" not in r["dst_url"] for r in rows)
    twin = sorted(tuple(r) for r in page_links_udf(pages).collect())
    assert twin == sorted(tuple(r) for r in rows)


def _seeded_cases(n=400):
    """400 seeded-random (i, base, href) cases spanning every href
    classification branch; generation stays inside the engine's
    documented bounds (dot-segment nesting <= 4, dots never inside
    query strings). Shared by the stdlib-urljoin oracle test and the
    staged-vs-composed equality test."""
    import random

    rng = random.Random(1234)
    segs = ["a", "b1", "Seg", "x-y", "p_q"]

    def rand_path(depth):
        return "".join("/" + rng.choice(segs) for _ in range(depth))

    cases = []
    for i in range(n):
        scheme = rng.choice(["http", "https", "HTTP", "hTtPs"])
        host = rng.choice(["h.test", "WWW.Ex.test", "Sub.Ex.test"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        bpath = rand_path(rng.randint(0, 3)) + rng.choice(["", "/page.html"])
        bq = rng.choice(["", "?b=1"])
        base = f"{scheme}://{host}{port}{bpath}{bq}"
        kind = rng.randrange(8)
        if kind == 0:  # absolute, maybe with dots
            href = (
                rng.choice(["http", "https", "ftp"])
                + "://Other.test"
                + rand_path(rng.randint(0, 2))
                + rng.choice(["", "/./x", "/d/../y"])
            )
        elif kind == 1:
            href = "//Cdn.test" + rand_path(rng.randint(0, 2))
        elif kind == 2:
            href = rand_path(rng.randint(1, 3)) or "/z"
        elif kind == 3:
            ups = "../" * rng.randint(1, 3)
            href = ups + rng.choice(segs) + rng.choice(["", ".html"])
        elif kind == 4:
            href = rng.choice(["./", ""]) + rng.choice(segs) + rng.choice(
                ["", "/sub", "?q=2"]
            )
        elif kind == 5:
            href = "?only=" + rng.choice(segs)
        elif kind == 6:
            href = rng.choice(["#frag", "", "  "])
        else:
            href = rng.choice(["mailto:a@b.c", "javascript:void(0)", "tel:+1"])
        cases.append((i, base, href))
    return cases


def test_resolution_matches_stdlib_urljoin(spark):
    # 400 seeded-random (base, href) cases in ONE Spark job, compared
    # against urllib.parse.urljoin (the stdlib's RFC 3986 resolver) +
    # the same canonicalization applied in pure Python. Generation stays
    # inside the engine's documented bounds (dot-segment nesting <= 4,
    # dots never inside query strings).
    # THE shared stdlib oracle (tests/conftest.py) — also used by the
    # hypothesis fuzz suite, so the two can never disagree on the contract
    from tests.conftest import stdlib_url_oracle as py_oracle

    cases = _seeded_cases()

    from fog_spark.functions.urlnorm import canonicalize_url, resolve_href

    df = spark.createDataFrame(cases, "i long, base string, href string")
    got = {
        r["i"]: r["dst"]
        for r in df.select(
            "i",
            canonicalize_url(
                resolve_href(F.col("base"), F.col("href"))
            ).alias("dst"),
        ).collect()
    }
    for i, base, href in cases:
        want = py_oracle(base, href)
        assert got[i] == want, (base, href, got[i], want)


def test_query_string_survives_canonicalization(spark):
    # dot-segment removal must not rewrite path-like QUERY contents
    from fog_spark.functions.urlnorm import canonicalize_url

    urls = [
        ("https://h.test/r?next=/a/../b",),
        ("https://h.test/a/../r?next=/a/../b",),
        ("https://h.test/x/./y?p=/./q",),
    ]
    df = spark.createDataFrame(urls, "u string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == [
        "https://h.test/r?next=/a/../b",
        "https://h.test/r?next=/a/../b",
        "https://h.test/x/y?p=/./q",
    ]


def test_whitespace_hrefs_native_equals_twin(spark):
    # newline/tab-wrapped hrefs (common in real HTML) must behave the
    # same in both paths: ASCII-whitespace-trimmed, then classified
    pages = _pages(
        spark,
        [
            (
                "https://h.test/a/b",
                '<html><body><a href="\n/x">n</a><a href="\t../y">t</a>'
                '<a href=" \n ">blank</a></body></html>',
            )
        ],
    )
    native = sorted(tuple(r) for r in page_links(pages).collect())
    twin = sorted(tuple(r) for r in page_links_udf(pages).collect())
    assert native == twin
    assert [r[1] for r in native] == ["https://h.test/x", "https://h.test/y"]


def test_strip_tracking_params(spark):
    from fog_spark.functions.urlnorm import strip_tracking_params

    cases = [
        ("https://h.test/p?utm_source=x&id=3", "https://h.test/p?id=3"),
        ("https://h.test/p?id=3&utm_source=x", "https://h.test/p?id=3"),
        ("https://h.test/p?utm_a=1&utm_b=2", "https://h.test/p"),
        ("https://h.test/p?fbclid=abc", "https://h.test/p"),
        ("https://h.test/p?xutm_a=1", "https://h.test/p?xutm_a=1"),
        ("https://h.test/p", "https://h.test/p"),
        ("https://h.test/p?gclid=1&a=2&mc_eid=3&b=4", "https://h.test/p?a=2&b=4"),
    ]
    df = spark.createDataFrame(cases, "u string, want string")
    got = df.select(strip_tracking_params(F.col("u")).alias("g"), "want").collect()
    for r in got:
        assert r["g"] == r["want"], (r["g"], r["want"])


def test_page_links_codegen_compiles(spark):
    # Regression: composing canonicalize_url(resolve_href(...)) as one
    # Column expression copies every reused subtree into each reference
    # and the generated projection blows the JVM's 64 KB method limit —
    # Spark then silently falls back to interpreted projection (seen as
    # "Code grows beyond 64 KB" driver noise and a ~2.7x slower scan).
    # page_links is staged through materialized intermediates precisely
    # to stay inside codegen; strict fallback confs make any compile
    # failure a hard error instead of a silent downgrade.
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        got = sorted(
            tuple(r) for r in page_links(_pages(spark, FIXTURE)).collect()
        )
        assert got == sorted(EXPECTED)
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_staged_page_links_equals_composed_helpers(spark):
    # page_links computes dst_url via STAGED projections (the
    # codegen-safe form); the exported Column helpers keep the composed
    # single-expression form (used by sitemaps/crawl on plain columns).
    # The two must stay semantically identical: run all 400 seeded cases
    # through both and compare. Each case becomes a one-anchor page with
    # the case index as anchor text so rows can be matched back.
    from fog_spark.functions.urlnorm import canonicalize_url, resolve_href

    cases = _seeded_cases()
    pages = spark.createDataFrame(
        [
            (
                str(i),
                base,
                f'<html><body><a href="{href}">{i}</a></body></html>'.encode(),
            )
            for i, base, href in cases
        ],
        "i string, url string, html binary",
    )
    staged = {
        r["anchor"]: r["dst_url"]
        for r in page_links(pages.select("url", "html")).collect()
    }
    composed = {
        r["i"]: r["dst"]
        for r in spark.createDataFrame(
            [(str(i), b, h) for i, b, h in cases],
            "i string, base string, href string",
        )
        .select(
            "i",
            canonicalize_url(
                resolve_href(F.col("base"), F.col("href"))
            ).alias("dst"),
        )
        .collect()
    }
    # dropped links (None from the composed form) must be absent from
    # page_links output; kept links must agree exactly
    for i, _base, _href in cases:
        key = str(i)
        if composed[key] is None:
            assert key not in staged, (key, staged.get(key))
        else:
            assert staged.get(key) == composed[key], (
                key, _base, _href, staged.get(key), composed[key],
            )
