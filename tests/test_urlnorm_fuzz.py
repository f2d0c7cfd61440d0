"""Hypothesis fuzz of URL resolution + canonicalization against the
stdlib (urllib.parse.urljoin + the same canonicalization in pure
Python) — the property-test complement to test_urlnorm's 400
seeded-random cases. Generation stays inside the engine's documented
bounds (dot-segment nesting <= 3, dots never inside query strings);
each hypothesis example is a BATCH of (base, href) pairs run through
ONE Spark job, so shrinking still isolates a minimal failing pair
while per-example cost stays one collect."""

import re
from urllib.parse import urljoin, urlsplit

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SEG = st.text(alphabet="abcdxyzAB19-_", min_size=1, max_size=6)


def _stdlib_oracle(base, href):
    """Same rules as test_urlnorm.test_resolution_matches_stdlib_urljoin."""

    def remove_dot_segments(path):
        out = []
        for seg in path.split("/"):
            if seg == ".":
                continue
            if seg == "..":
                if len(out) > 1:
                    out.pop()
            else:
                out.append(seg)
        if path.endswith(("/.", "/..")):
            out.append("")
        return "/".join(out)

    h = href.strip()
    if not h or h.startswith("#"):
        return None
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", h)
    if m and m.group(1).lower() not in ("http", "https"):
        return None
    s = urlsplit(urljoin(base, h))
    scheme = s.scheme.lower()
    host = s.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[: -len(":80")]
    if scheme == "https" and host.endswith(":443"):
        host = host[: -len(":443")]
    path = remove_dot_segments(s.path) or "/"
    if not path.startswith("/"):
        path = "/" + path
    q = f"?{s.query}" if s.query else ""
    return f"{scheme}://{host}{path}{q}"


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
