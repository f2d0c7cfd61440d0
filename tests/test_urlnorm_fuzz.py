"""Hypothesis fuzz of URL resolution + canonicalization against the
stdlib (urllib.parse.urljoin + the same canonicalization in pure
Python) — the property-test complement to test_urlnorm's 400
seeded-random cases. Generation stays inside the engine's documented
bounds (dot-segment nesting <= 3, dots never inside query strings);
each hypothesis example is a BATCH of (base, href) pairs run through
ONE Spark job, so shrinking still isolates a minimal failing pair
while per-example cost stays one collect."""

import pytest

pytest.importorskip("hypothesis")  # degrade to skip in minimal envs

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import stdlib_url_oracle as _stdlib_oracle  # noqa: E402

_SEG = st.text(alphabet="abcdxyzAB19-_", min_size=1, max_size=6)


@st.composite
def _case(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "hTtPs"]))
    host = draw(st.sampled_from(["h.test", "WWW.Ex.test", "Sub.Ex.test"]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    bsegs = draw(st.lists(_SEG, max_size=3))
    bpath = "".join("/" + s for s in bsegs) + draw(
        st.sampled_from(["", "/page.html"])
    )
    bq = draw(st.sampled_from(["", "?b=1"]))
    base = f"{scheme}://{host}{port}{bpath}{bq}"
    kind = draw(st.integers(0, 7))
    seg = draw(_SEG)
    if kind == 0:
        href = (
            draw(st.sampled_from(["http", "https", "ftp"]))
            + "://Other.test/"
            + seg
            + draw(st.sampled_from(["", "/./x", "/d/../y"]))
        )
    elif kind == 1:
        href = "//Cdn.test/" + seg
    elif kind == 2:
        href = "/" + seg + draw(st.sampled_from(["", "/sub"]))
    elif kind == 3:
        href = "../" * draw(st.integers(1, 3)) + seg + draw(
            st.sampled_from(["", ".html"])
        )
    elif kind == 4:
        href = draw(st.sampled_from(["./", ""])) + seg + draw(
            st.sampled_from(["", "/sub", "?q=2"])
        )
    elif kind == 5:
        href = "?only=" + seg
    elif kind == 6:
        href = draw(st.sampled_from(["#frag", "", "  "]))
    else:
        href = draw(
            st.sampled_from(["mailto:a@b.c", "javascript:void(0)", "tel:+1"])
        )
    return base, href


@settings(max_examples=6, deadline=None)
@given(st.lists(_case(), min_size=1, max_size=30))
def test_resolution_fuzz_matches_stdlib(spark, cases):
    from fog_spark.functions.urlnorm import canonicalize_url, resolve_href

    rows = [(i, b, h) for i, (b, h) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, base string, href string")
    got = {
        r["i"]: r["dst"]
        for r in df.select(
            "i",
            canonicalize_url(resolve_href(F.col("base"), F.col("href"))).alias(
                "dst"
            ),
        ).collect()
    }
    for i, (base, href) in enumerate(cases):
        assert got[i] == _stdlib_oracle(base, href), (base, href)


@settings(max_examples=4, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 60),
        st.integers(0, 60),
        min_size=1,
        max_size=40,
    )
)
def test_redirect_resolution_fuzz(spark, mapping):
    """resolve_redirects over arbitrary functional maps (trees, chains,
    cycles, self-loops all arise) vs the sequential bounded replay —
    hypothesis shrinks any failure to a minimal map."""
    from fog_spark.operators.redirects import resolve_redirects

    pairs = [(str(a), str(b)) for a, b in mapping.items()]
    m = {a: b for a, b in pairs if a != b}
    want = {}
    for u in m:
        cur, hops = m[u], 1
        while hops < 8 and cur in m:
            cur, hops = m[cur], hops + 1
        want[u] = (cur, hops, cur not in m)
    df = spark.createDataFrame(pairs, "url string, target string")
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=8).collect()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=60,
    )
)
def test_census_fuzz(spark, pairs):
    """census_stats over arbitrary small multigraphs (duplicates and
    self-loops arise freely) vs the pure-Python replay — including the
    empty/self-loop-only edge the ANSI guard covers."""
    from fog_spark import graph as G
    from tests.test_graph import _census_oracle

    want, _r = _census_oracle(pairs)
    rows = [(int(a), int(b), 1.0) for a, b in pairs]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = G.census_stats(df).collect()[0].asDict()
    assert got == want
