"""Redirect-chain resolution (operators/redirects.py): pointer-doubled
resolution vs a sequential pure-Python replay, cycle/overlong handling,
link rewriting, and rel=canonical extraction."""

from pyspark.sql import functions as F

from fog_spark.operators.redirects import (
    canonical_edges,
    collapse_redirect_map,
    resolve_redirects,
    rewrite_links,
)


def _resolve_oracle(pairs, max_hops=16):
    """Sequential bounded replay of resolve_redirects' contract."""
    m = {}
    for s, d in pairs:
        if s != d and (s not in m or d < m[s]):
            m[s] = d
    out = {}
    for u in m:
        cur, hops = m[u], 1
        while hops < max_hops and cur in m:
            cur, hops = m[cur], hops + 1
        out[u] = (cur, hops, cur not in m)
    return out


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "url string, target string"
    )


def _check(spark, pairs, max_hops=16):
    want = _resolve_oracle(pairs, max_hops)
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(_df(spark, pairs), max_hops=max_hops).collect()
    }
    assert got == want


def test_chain_and_terminal(spark):
    # a->b->c->d, plus e->d
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")])
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(
            _df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        ).collect()
    }
    assert got == {"a": ("d", 3, True), "b": ("d", 2, True), "c": ("d", 1, True)}


def test_cycle_marks_unresolved(spark):
    rows = resolve_redirects(_df(spark, [("a", "b"), ("b", "a")]), max_hops=4).collect()
    assert {r["url"]: r["resolved"] for r in rows} == {"a": False, "b": False}
    # target at exactly max_hops hops: 4 hops around a 2-cycle lands home
    assert {r["url"]: r["final_url"] for r in rows} == {"a": "a", "b": "b"}
    assert all(r["hops"] == 4 for r in rows)
    _check(spark, [("a", "b"), ("b", "a")], max_hops=4)


def test_long_chain_cap_and_exactness(spark):
    # chain of 30 hops with max_hops=16: unresolved, target at hop 16
    chain = [(f"u{i:02d}", f"u{i + 1:02d}") for i in range(30)]
    _check(spark, chain, max_hops=16)
    rows = {
        r["url"]: r
        for r in resolve_redirects(_df(spark, chain), max_hops=16).collect()
    }
    assert not rows["u00"]["resolved"] and rows["u00"]["final_url"] == "u16"
    assert rows["u20"]["resolved"] and rows["u20"]["hops"] == 10
    # every depth 1..16 appears exactly (hop counts are exact, not bounds)
    assert rows["u14"]["hops"] == 16 and rows["u14"]["resolved"]


def test_collapse_and_self_redirects(spark):
    # self-redirect dropped; conflicting captures collapse to min target
    m = {
        r["url"]: r["target"]
        for r in collapse_redirect_map(
            _df(spark, [("a", "a"), ("a", "c"), ("a", "b"), ("b", "b")])
        ).collect()
    }
    assert m == {"a": "b"}
    _check(spark, [("a", "a"), ("a", "c"), ("a", "b"), ("b", "b")])


def test_random_redirect_forest(spark):
    # seeded pseudo-random functional map over 400 nodes: mixes trees,
    # chains and small cycles; hop counts must match the replay exactly
    pairs = [(f"n{i}", f"n{(i * i * 7 + 13) % 401}") for i in range(400)]
    _check(spark, pairs, max_hops=16)
    _check(spark, pairs, max_hops=8)


def test_rewrite_links(spark):
    res = resolve_redirects(
        _df(spark, [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")])
    )
    links = spark.createDataFrame(
        [("p1", "a"), ("p2", "c"), ("p3", "x"), ("p4", "z")],
        "url string, dst_url string",
    )
    got = {
        r["url"]: r["dst_url"] for r in rewrite_links(links, res).collect()
    }
    # a resolves to c; c and z pass through; x is cyclic -> untouched
    assert got == {"p1": "c", "p2": "c", "p3": "x", "p4": "z"}
    got_all = {
        r["url"]: r["dst_url"]
        for r in rewrite_links(links, res, resolved_only=False).collect()
    }
    assert got_all["p3"] == "x"  # 4 hops around the 2-cycle lands home


def test_max_hops_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        resolve_redirects(_df(spark, [("a", "b")]), max_hops=10)


def test_canonical_edges_extraction(spark):
    pages = spark.createDataFrame(
        [
            # relative canonical, rel after href, single quotes
            (
                "http://h1.test/a/page?x=1",
                "<html><head><link href='/a/' rel='canonical'></head></html>",
            ),
            # absolute canonical with default port + uppercase host
            (
                "http://h2.test/p",
                '<link rel="canonical" href="HTTP://H2.TEST:80/canon">'
                '<link rel="canonical" href="/second-ignored">',
            ),
            # self-canonical -> dropped
            ("http://h3.test/", '<link rel="canonical" href="http://h3.test/">'),
            # stylesheet link only -> no canonical
            ("http://h4.test/", '<link rel="stylesheet" href="/style.css">'),
            # no html head links at all
            ("http://h5.test/", "<p>hello</p>"),
        ],
        "url string, html_s string",
    ).select("url", F.encode("html_s", "UTF-8").alias("html"))
    got = {r["url"]: r["target"] for r in canonical_edges(pages).collect()}
    assert got == {
        "http://h1.test/a/page?x=1": "http://h1.test/a/",
        "http://h2.test/p": "http://h2.test/canon",
    }


def test_canonical_feeds_resolver(spark):
    # canonical declarations + an HTTP redirect compose in one resolution
    pages = spark.createDataFrame(
        [
            ("http://h.test/amp/x", '<link rel="canonical" href="/x">'),
        ],
        "url string, html_s string",
    ).select("url", F.encode("html_s", "UTF-8").alias("html"))
    http = spark.createDataFrame(
        [("http://h.test/x", "http://h.test/x-final")], "url string, target string"
    )
    combined = canonical_edges(pages).unionByName(http)
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(combined).collect()
    }
    assert got == {
        "http://h.test/amp/x": ("http://h.test/x-final", 2, True),
        "http://h.test/x": ("http://h.test/x-final", 1, True),
    }


def test_canonical_rel_token_list_and_unquoted_href(spark):
    # rel is a token list per the HTML spec; href may be unquoted
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            ("http://h1.test/p", '<link rel="alternate canonical" href="/x">'),
            ("http://h2.test/p", "<link rel=canonical href=/canon>"),
            ("http://h3.test/p", '<link rel="alternate" href="/not-canon">'),
            # 'canonical' as a substring of another token must NOT match
            ("http://h4.test/p", '<link rel="noncanonicalish" href="/no">'),
        ],
        "url string, html_s string",
    ).select("url", F.encode("html_s", "UTF-8").alias("html"))
    got = {r["url"]: r["target"] for r in canonical_edges(pages).collect()}
    assert got == {
        "http://h1.test/p": "http://h1.test/x",
        "http://h2.test/p": "http://h2.test/canon",
    }
