"""Near-dup cluster collapse: LSH bucket -> star edges -> CC.

Pins the load-bearing property: the star graph's connected components
equal the all-pairs bucket graph's components (brute-force union-find
oracle), while the edge count stays LINEAR in corpus size even when
every document is identical (the degenerate-bucket case that makes an
all-pairs candidate join quadratic).
"""

import pytest
from pyspark.sql import functions as F

from fog_spark.operators.dedup import (
    _lsh_buckets,
    dedup_near,
    jaccard_on_pairs,
    lsh_star_edges,
    near_dup_clusters,
)

SF_DIR = "/root/testdata/sf0.001"

KW = dict(num_hashes=16, bands=4, shingle_n=3)


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    d.count()
    yield d
    d.unpersist()


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _partition(pairs_iter, all_ids):
    """frozenset-of-frozensets partition from (a, b) links + singletons."""
    uf = _UF()
    for a in all_ids:
        uf.find(a)
    for a, b in pairs_iter:
        uf.union(a, b)
    groups = {}
    for a in all_ids:
        groups.setdefault(uf.find(a), set()).add(a)
    return frozenset(frozenset(g) for g in groups.values())


def test_clusters_equal_all_pairs_bucket_components(spark, docs):
    """Star-edge CC == union-find over ALL same-bucket pairs."""
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    # brute-force oracle: group by bucket, link everything in a bucket
    buckets = {}
    for r in _lsh_buckets(docs, "text", "doc_id", **KW).collect():
        buckets.setdefault((r.band, r.bh), []).append(r.id)
    links = []
    for members in buckets.values():
        root = min(members)
        links.extend((root, m) for m in members if m != root)
    expected = _partition(links, all_ids)

    got_rows = near_dup_clusters(spark, docs, **KW).collect()
    assert len(got_rows) == len(all_ids)
    got = {}
    for r in got_rows:
        got.setdefault(r.cluster, set()).add(r.doc_id)
    assert frozenset(frozenset(g) for g in got.values()) == expected
    # cluster label is the min member id
    for c, members in got.items():
        assert c == min(members)


def test_star_edges_linear_on_degenerate_corpus(spark):
    """1000 identical docs -> ONE bucket per band; the star graph carries
    <= N-1 distinct edges (vs ~500k all-pairs), and they form 1 cluster."""
    n = 1000
    d = spark.createDataFrame(
        [(i, "the same boilerplate page text repeated everywhere") for i in range(n)],
        "doc_id long, text string",
    )
    e = lsh_star_edges(d, **KW)
    assert e.count() == n - 1  # distinct (min_id, other) pairs only
    labels = near_dup_clusters(spark, d, **KW)
    assert labels.select("cluster").distinct().count() == 1


def test_short_docs_are_singletons(spark):
    """Docs below one shingle produce no buckets and label themselves."""
    d = spark.createDataFrame(
        [(1, "tiny"), (2, "also small"), (3, "x"),
         (4, "a long enough document sharing nothing with the others at all")],
        "doc_id long, text string",
    )
    labels = {r.doc_id: r.cluster for r in near_dup_clusters(spark, d, **KW).collect()}
    assert labels == {1: 1, 2: 2, 3: 3, 4: 4}


def test_jaccard_on_pairs_exact(spark):
    a = "alpha beta gamma delta epsilon zeta"          # shingles: 4
    b = "alpha beta gamma delta epsilon eta"           # 3 shared with a
    c = "one two three four five six"
    d = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in jaccard_on_pairs(d, pairs).collect()}

    def sh(t, n=3):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    for (x, y), texts in {(1, 2): (a, b), (1, 3): (a, c)}.items():
        sa, sb = sh(texts[0]), sh(texts[1])
        exact = len(sa & sb) / len(sa | sb)
        assert got[(x, y)] == pytest.approx(exact)


def test_verified_clusters_drop_false_bucket_friends(spark):
    """jaccard_threshold=1.0 keeps only exact-duplicate star edges: the
    near-but-not-identical doc must fall out of the cluster."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " with a tail"
    d = spark.createDataFrame(
        [(1, base), (2, base), (3, near)], "doc_id long, text string"
    )
    loose = {r.doc_id: r.cluster
             for r in near_dup_clusters(spark, d, **KW).collect()}
    assert loose[1] == loose[2] == 1  # identical docs always cluster
    strict = {r.doc_id: r.cluster
              for r in near_dup_clusters(
                  spark, d, jaccard_threshold=1.0, **KW).collect()}
    assert strict[1] == strict[2] == 1
    assert strict[3] == 3


def test_dedup_near_keeps_one_per_cluster(spark, docs):
    clusters = near_dup_clusters(spark, docs, **KW)
    n_clusters = clusters.select("cluster").distinct().count()
    kept = dedup_near(spark, docs, **KW)
    assert kept.count() == n_clusters
    assert kept.columns == docs.columns
    # keepers are exactly the cluster labels
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    label_ids = {r.cluster for r in clusters.select("cluster").distinct().collect()}
    assert kept_ids == label_ids
