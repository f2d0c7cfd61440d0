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


def _row_key(r):
    return (r["url"], r["record_id"], bytes(r["html"]), r["warc_ts"], r["warc_type"])


def test_split_reader_matches_sequential_multi_task(spark, tmp_path):
    # VERDICT r03 "Next round" #4: a multi-member .warc.gz read by MANY
    # byte-range tasks must yield exactly the sequential reader's rows.
    # 60 records, range_bytes=512 -> the file spans dozens of ranges and
    # members straddle range boundaries.
    import os

    from fog_spark.sources.warc import read_warc_split

    rows = [
        {
            "url": f"https://w{i % 7}.test/p/{i}",
            "warc_date": f"2026-03-{(i % 27) + 1:02d}T00:00:00Z",
            "body": (f"<html><body>doc {i} " + "x" * (50 + 13 * (i % 9))).encode()
            + b"</body></html>",
        }
        for i in range(60)
    ]
    p = str(tmp_path / "big.warc.gz")
    write_warc(rows, p, compress=True)
    n_ranges = -(-os.path.getsize(p) // 512)
    assert n_ranges > 10  # genuinely many parallel units
    seq = sorted(map(_row_key, read_warc(spark, p).collect()))
    par = sorted(
        map(_row_key, read_warc_split(spark, p, range_bytes=512).collect())
    )
    assert len(seq) == 60
    assert par == seq


def test_split_reader_plain_file_fallback(spark, tmp_path):
    # a non-gzip .warc is not splittable: the start==0 range parses the
    # whole file, other ranges contribute nothing, rows still match
    from fog_spark.sources.warc import read_warc_split

    p = str(tmp_path / "plain.warc")
    write_warc(ROWS, p)
    seq = sorted(map(_row_key, read_warc(spark, p).collect()))
    par = sorted(map(_row_key, read_warc_split(spark, p, range_bytes=256).collect()))
    assert par == seq and len(seq) > 0


def test_split_reader_skips_inter_member_junk(spark, tmp_path):
    # junk between members carrying a FALSE gzip magic must be skipped by
    # validation (inflate fails / payload isn't WARC/) while both real
    # members are found — the resync case the sequential gzip reader
    # cannot handle at all
    from fog_spark.sources.warc import read_warc_split

    def member(i):
        body = f"<html>m{i}</html>".encode()
        payload = b"HTTP/1.1 200 OK\r\n\r\n" + body
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:j-{i}>\r\n".encode()
            + f"WARC-Target-URI: https://j.test/{i}\r\n".encode()
            + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
            + b"\r\n\r\n"
        )
        return gzip.compress(rec)

    blob = member(0) + b"\x1f\x8b\x08 not a real member " + member(1)
    p = str(tmp_path / "junk.warc.gz")
    with open(p, "wb") as f:
        f.write(blob)
    got = sorted(
        r["url"] for r in read_warc_split(spark, p, range_bytes=64).collect()
    )
    assert got == ["https://j.test/0", "https://j.test/1"]


def test_fogwarc_datasource_matches_readers(spark, tmp_path):
    # the registered Python Data Source (Spark 4): planning owns the
    # byte-range partitions natively; rows must equal both other readers
    from fog_spark.sources.warc_datasource import WarcDataSource, WarcReader

    rows = [
        {
            "url": f"https://ds{i % 5}.test/p/{i}",
            "warc_date": f"2026-04-{(i % 27) + 1:02d}T12:00:00Z",
            "body": (f"<html>ds {i} " + "y" * (40 + 7 * (i % 11))).encode() + b"</html>",
        }
        for i in range(50)
    ]
    p = str(tmp_path / "ds.warc.gz")
    write_warc(rows, p, compress=True)
    spark.dataSource.register(WarcDataSource)
    df = (
        spark.read.format("fogwarc")
        .option("range_bytes", "512")
        .load(p)
    )
    # planning sees many genuine partitions
    n_parts = len(WarcReader({"path": p, "range_bytes": "512"}).partitions())
    assert n_parts > 10
    got = sorted(map(_row_key, df.collect()))
    seq = sorted(map(_row_key, read_warc(spark, p).collect()))
    assert len(got) == 50
    assert got == seq
