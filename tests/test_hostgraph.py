"""Host-graph rollup: counts pinned to a pure-Python oracle over the
deterministic pages fixture; dense ids and PageRank composition smoke."""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fog_spark.operators.hostgraph import (
    host_graph,
    host_link_counts,
    host_of,
    host_pagerank_milli,
)
from fog_spark.sources.pages import (
    _py_dsts,
    _py_url,
    generate_pages,
    n_sites_for,
)

N_DOCS = 2000


def _host(k: int) -> str:
    return f"site{k % n_sites_for(N_DOCS)}.example"


def _oracle_counts() -> Counter:
    c = Counter()
    for k in range(N_DOCS):
        for d in _py_dsts(k, N_DOCS):
            c[(_host(k), _host(d))] += 1
    return c


def test_host_of_expression(spark):
    rows = spark.createDataFrame(
        [
            ("https://Site3.Example/p/9?q=1", "site3.example"),
            ("http://a.b.c:8080/x", "a.b.c"),
            ("ftp+ssh://weird.host/path#frag", "weird.host"),
            ("not a url", ""),
            ("/relative/path", ""),
        ],
        "url string, want string",
    ).select(host_of(F.col("url")).alias("got"), "want")
    assert all(r["got"] == r["want"] for r in rows.collect())


def test_host_link_counts_match_oracle(spark):
    pages = generate_pages(spark, N_DOCS)
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_counts(pages).collect()
    }
    assert got == dict(_oracle_counts())


def test_host_graph_dense_ids_and_weights(spark):
    pages = generate_pages(spark, N_DOCS)
    dim, edges = host_graph(pages)
    hosts = {r["host"]: r["id"] for r in dim.collect()}
    # dense 0..n-1, one id per host, every fixture host present
    assert sorted(hosts.values()) == list(range(len(hosts)))
    assert set(hosts) == {_host(k) for k in range(N_DOCS)}
    want = _oracle_counts()
    got = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    assert got == {
        (hosts[s], hosts[d]): float(n) for (s, d), n in want.items()
    }


def test_host_pagerank_composes(spark):
    pages = generate_pages(spark, N_DOCS)
    ranks = {r["host"]: r["rank_milli"] for r in host_pagerank_milli(spark, pages, niters=4).collect()}
    assert set(ranks) == {_host(k) for k in range(N_DOCS)}
    assert all(v > 0 for v in ranks.values())
    # deterministic: a second run is bit-identical
    again = {r["host"]: r["rank_milli"] for r in host_pagerank_milli(spark, pages, niters=4).collect()}
    assert ranks == again


def test_cli_host_pagerank(spark, tmp_path):
    from fog_spark.__main__ import main

    pages_pq = str(tmp_path / "pages_pq")
    out = str(tmp_path / "hpr_out")
    generate_pages(spark, 300).write.mode("overwrite").parquet(pages_pq)
    rc = main(
        ["--algo", "host-pagerank", "--edges", pages_pq, "--format", "pages",
         "--pagerank-niters", "3", "--output", out],
        spark=spark,
    )
    assert rc == 0
    rows = spark.read.parquet(out).collect()
    assert {r["host"] for r in rows} == {_hostn(k, 300) for k in range(300)}
    assert all(r["rank_milli"] > 0 for r in rows)


def _hostn(k: int, n_docs: int) -> str:
    return f"site{k % n_sites_for(n_docs)}.example"


def test_host_spam_mass_composes(spark):
    import pytest

    from fog_spark.operators.hostgraph import host_spam_mass

    pages = generate_pages(spark, N_DOCS)
    trusted = [_host(0), _host(1)]
    rows = host_spam_mass(spark, pages, trust_hosts=trusted, niters=4).collect()
    got = {r["host"]: r for r in rows}
    assert set(got) == {_host(k) for k in range(N_DOCS)}
    # rescaled trust mass ~= rank mass (equal up to the integer-div slack)
    s_pr = sum(r["pr_milli"] for r in rows)
    s_tr = sum(r["trust_milli"] for r in rows)
    assert 0 <= s_pr - s_tr <= len(rows) * 2
    # trusted seeds hold trust-sourced mass; spam_permille caps at 1000
    for h in trusted:
        assert got[h]["trust_milli"] > 0
    assert all(r["spam_permille"] <= 1000 for r in rows)
    # deterministic across runs
    again = {
        r["host"]: r["spam_permille"]
        for r in host_spam_mass(spark, pages, trust_hosts=trusted, niters=4).collect()
    }
    assert again == {h: r["spam_permille"] for h, r in got.items()}
    with pytest.raises(ValueError):
        host_spam_mass(spark, pages, trust_hosts=[])
    with pytest.raises(ValueError):
        host_spam_mass(spark, pages, trust_hosts=["not-a-host.test"])
