"""WARC source: spec-shaped round-trips (plain + per-record-gzip) and
composition into the extraction pipeline (fog_spark/sources/warc.py)."""

import datetime as dt
import gzip

from pyspark.sql import functions as F

from fog_spark.sources.warc import read_warc, write_warc

ROWS = [
    {
        "url": "https://h0.test/p/0",
        "warc_date": "2026-01-02T03:04:05Z",
        "body": b'<html><body><a href="https://h1.test/p/1">x</a></body></html>',
    },
    {
        "url": "https://h1.test/p/1",
        "warc_date": "2026-01-02T03:04:06Z",
        "body": b"<html><body>no links</body></html>",
    },
    {
        "url": "https://h2.test/p/2",
        "warc_date": "2026-01-02T03:04:07Z",
        "body": b'<html><a href="https://h0.test/p/0">y</a><a href="https://h1.test/p/1">z</a></html>',
    },
]


def _check(got):
    assert len(got) == len(ROWS)
    by_url = {r["url"]: r for r in got}
    for want in ROWS:
        r = by_url[want["url"]]
        assert bytes(r["html"]) == want["body"]  # HTTP headers stripped
        assert r["warc_type"] == "response"
        assert r["warc_ts"] == dt.datetime.fromisoformat(
            want["warc_date"].replace("Z", "")
        )


def test_warc_roundtrip_plain(spark, tmp_path):
    p = str(tmp_path / "a.warc")
    write_warc(ROWS, p)
    _check(read_warc(spark, p).collect())


def test_warc_roundtrip_gzip_members(spark, tmp_path):
    p = str(tmp_path / "a.warc.gz")
    write_warc(ROWS, p, compress=True)
    _check(read_warc(spark, p).collect())


def test_warc_skips_non_response_and_junk(spark, tmp_path):
    p = str(tmp_path / "mixed.warc")
    body = b"1.2.3.4 crawler"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:info>\r\n"
        b"WARC-Date: 2026-01-02T00:00:00Z\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n" + body + b"\r\n\r\n"
    )
    with open(p, "wb") as f:
        f.write(b"junk preamble\r\n")
        f.write(rec)
    write_warc(ROWS, str(tmp_path / "b.warc"))
    with open(str(tmp_path / "b.warc"), "rb") as f:
        open(p, "ab").write(f.read())

    got = read_warc(spark, p).collect()
    _check(got)  # warcinfo + junk are filtered by default
    all_types = {
        r["warc_type"]
        for r in read_warc(spark, p, warc_types=()).collect()
    }
    assert all_types == {"warcinfo", "response"}


def test_cli_warc_format(spark, tmp_path):
    # full CLI path: --format warc -> href extraction -> stats
    from fog_spark.__main__ import build_parser, run

    p = str(tmp_path / "c.warc.gz")
    write_warc(ROWS, p, compress=True)
    stats = run(
        build_parser().parse_args(
            ["--algo", "stats", "--edges", p, "--format", "warc"]
        ),
        spark,
    ).collect()[0]
    assert stats["num_edges"] == 3


def test_warc_to_link_graph(spark, tmp_path):
    # the full WARC -> pages -> href extraction composition
    from fog_spark.functions.extract import extract_outlinks_col

    d = str(tmp_path / "seg")
    import os

    os.makedirs(d)
    write_warc(ROWS, f"{d}/part0.warc.gz", compress=True)
    pages = read_warc(spark, d)
    edges = pages.select(
        "url", F.explode(extract_outlinks_col(F.col("html"))).alias("dst_url")
    )
    got = {(r["url"], r["dst_url"]) for r in edges.collect()}
    assert got == {
        ("https://h0.test/p/0", "https://h1.test/p/1"),
        ("https://h2.test/p/2", "https://h0.test/p/0"),
        ("https://h2.test/p/2", "https://h1.test/p/1"),
    }
