import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from fog_spark.session import get_spark

    s = get_spark("fog_spark_tests", cores=4, shuffle_partitions=8)
    yield s


def make_edges_df(spark, pairs, weighted=True):
    """Edge DataFrame from python (src, dst) pairs with the deterministic
    FIXTURES F2 weight rule (hash-derived, matches Spark xxhash64)."""
    from fog_spark.hashing import pmod, xxhash64

    rows = [
        (int(s), int(d), 1.0 + pmod(xxhash64(int(s), int(d)), 9000) / 1000.0)
        for s, d in pairs
    ]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return df if weighted else df.select("src", "dst")


def stdlib_url_oracle(base, href):
    """Resolution+canonicalization contract replayed via the stdlib
    (urllib.parse.urljoin + the engine's canonicalization rules in pure
    Python) — THE shared oracle for the seeded-random pin
    (tests/test_urlnorm.py) and the hypothesis fuzz
    (tests/test_urlnorm_fuzz.py), so the two suites can never disagree
    about what correct output is. None = the engine drops the link."""
    import re
    from urllib.parse import urljoin, urlsplit

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
