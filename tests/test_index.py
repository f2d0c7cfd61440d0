"""Inverted index + BM25 (operators/index.py) vs pure-Python replays."""

import math

from fog_spark.operators.index import (
    bm25_topk,
    bm25_topk_micro,
    build_postings,
    doc_lengths,
    tokenize_query,
)

DOCS = [
    (0, "spark join order spark spark hash"),
    (1, "hash table scan fast fast fast hash"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark window stream watermark state"),
    (4, ""),  # empty doc: in N and avgdl, never in postings
    (5, "join join join join join join join join join join"),
]
QUERIES = ["spark join", "fast hash table", "watermark", "zzz-nothing"]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _tok(text):
    import re

    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _replay(k1_micro=1_200_000, b_micro=750_000):
    """Integer replay of bm25_topk_micro's documented contract."""
    toks = {d: _tok(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl_milli = max(1, (1000 * sum(len(v) for v in toks.values())) // n)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, q in enumerate(QUERIES):
        scores = {}
        for t in tokenize_query(q):
            if t not in df:
                continue
            for d, ts in toks.items():
                tf = ts.count(t)
                if not tf:
                    continue
                dl = len(ts)
                r = (1000000000 * dl) // avgdl_milli
                lnorm = 1000000 - b_micro + (b_micro * r) // 1000000
                xk = (k1_micro * lnorm) // 1000000
                tfc = (1000000 * (tf * (k1_micro + 1000000))) // (1000000 * tf + xk)
                idf = (1000 * n) // df[t]
                scores[d] = scores.get(d, 0) + (idf * tfc) // 1000
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_postings_and_lengths(spark):
    d = _docs_df(spark)
    p = {(r["term"], r["doc_id"]): r["tf"] for r in build_postings(d).collect()}
    assert p[("spark", 0)] == 3 and p[("join", 5)] == 10 and ("", 4) not in p
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(d).collect()}
    assert dl[4] == 0 and dl[2] == 9


def test_bm25_micro_matches_replay(spark):
    want = _replay()
    rows = bm25_topk_micro(_docs_df(spark), QUERIES, k=10).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score_micro"]))
    assert got == {qid: lst for qid, lst in want.items() if lst}
    # ranks are 1..n contiguous per query
    for r in rows:
        assert 1 <= r["rank"] <= 10


def test_bm25_float_matches_replay(spark):
    toks = {d: _tok(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = max(1, (1000 * sum(len(v) for v in toks.values())) // n) / 1000.0
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    k1, b = 1.2, 0.75
    rows = bm25_topk(_docs_df(spark), QUERIES, k=10).collect()
    for r in rows:
        q = QUERIES[r["query_id"]]
        want = 0.0
        for t in tokenize_query(q):
            ts = toks[r["doc_id"]]
            tf = ts.count(t)
            if not tf or t not in df:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            want += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        assert abs(r["score"] - want) < 1e-9


def test_bm25_ranking_sanity(spark):
    rows = bm25_topk_micro(_docs_df(spark), QUERIES, k=3).collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    # "spark join": doc 0 (3x spark + join) beats doc 3 (1x spark)
    assert by_q[0][0] == 0
    # "fast hash table": doc 1 holds every term
    assert by_q[1][0] == 1
    # "watermark" only matches doc 3; "zzz-nothing" matches nothing
    assert by_q[2] == [3]
    assert 3 not in by_q


def test_topk_truncates(spark):
    rows = bm25_topk_micro(_docs_df(spark), ["join"], k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 5  # join x10 dominates


def test_prebuilt_index_matches_adhoc(spark, tmp_path):
    """The production shape — persisted postings + lengths — scores
    identically to the ad-hoc re-tokenizing path."""
    d = _docs_df(spark)
    p_path, l_path = str(tmp_path / "postings"), str(tmp_path / "lengths")
    build_postings(d).write.mode("overwrite").parquet(p_path)
    doc_lengths(d).write.mode("overwrite").parquet(l_path)
    pre = bm25_topk_micro(
        d,
        QUERIES,
        k=10,
        postings=spark.read.parquet(p_path),
        lengths=spark.read.parquet(l_path),
    ).collect()
    adhoc = bm25_topk_micro(d, QUERIES, k=10).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score_micro"])
    assert sorted(map(key, pre)) == sorted(map(key, adhoc))


def test_tf_clamp_prevents_overflow(spark):
    """A keyword-stuffed page with a huge tf must not abort the job under
    ANSI overflow checking (review finding): tf clamps at TF_CAP, and any
    tf >= TF_CAP scores identically."""
    from fog_spark.operators.index import TF_CAP

    def run(tf):
        # dl held constant across runs so avgdl (and hence every score)
        # depends only on the clamp
        postings = spark.createDataFrame(
            [("spark", 0, tf), ("spark", 1, 1)], "term string, doc_id long, tf long"
        )
        lengths = spark.createDataFrame(
            [(0, 100), (1, 5)], "doc_id long, dl long"
        )
        docs = spark.createDataFrame([(0, ""), (1, "")], "doc_id long, text string")
        return {
            r["doc_id"]: r["score_micro"]
            for r in bm25_topk_micro(
                docs, ["spark"], k=10, postings=postings, lengths=lengths
            ).collect()
        }
    huge = run(10_000_000)  # raw expr would exceed BIGINT
    capped = run(TF_CAP)
    assert huge == capped  # tf saturates at the clamp; nothing aborts


def test_bm25f_single_field_equals_plain(spark):
    """BM25F over one field at weight 1000 is IDENTICALLY plain BM25
    micro — the (a*c) div (b*c) == a div b algebra in the docstring."""
    from fog_spark.operators.index import bm25f_topk_micro

    d = _docs_df(spark)
    p, l = build_postings(d), doc_lengths(d)
    f = bm25f_topk_micro([(p, l)], [1000], QUERIES, k=10).collect()
    plain = bm25_topk_micro(d, QUERIES, k=10).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score_micro"])
    assert sorted(map(key, f)) == sorted(map(key, plain))
    # the identity must hold BEYOND tf=1000 too (the review caught a
    # clamp that bound 1000x too early): prebuilt postings with tf=5000
    hp = spark.createDataFrame(
        [("spark", 0, 5000), ("spark", 1, 1)], "term string, doc_id long, tf long"
    )
    hl = spark.createDataFrame([(0, 6000), (1, 5)], "doc_id long, dl long")
    docs2 = spark.createDataFrame([(0, ""), (1, "")], "doc_id long, text string")
    f2 = bm25f_topk_micro([(hp, hl)], [1000], ["spark"], k=10).collect()
    plain2 = bm25_topk_micro(
        docs2, ["spark"], k=10, postings=hp, lengths=hl
    ).collect()
    assert sorted(map(key, f2)) == sorted(map(key, plain2))


def test_bm25f_doc_missing_from_all_lengths_scores_dl0(spark):
    """A doc_id present in a field's postings but absent from EVERY
    field's lengths frame scores with _dl = 0 (the docstring's 'a doc
    missing from a field's frames contributes 0'), instead of being
    silently dropped by an inner join with DL (advice finding). Only
    reachable with hand-built inconsistent field inputs."""
    from fog_spark.operators.index import bm25f_topk_micro

    p = spark.createDataFrame(
        [("spark", 0, 3), ("spark", 1, 3)], "term string, doc_id long, tf long"
    )
    # doc 1 has postings but NO lengths row anywhere
    l = spark.createDataFrame([(0, 10)], "doc_id long, dl long")
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25f_topk_micro([(p, l)], [1000], ["spark"], k=10).collect()
    }
    assert set(got) == {0, 1}
    # _dl = 0 minimizes the length penalty, so doc 1 outranks doc 0
    assert got[1] > got[0]


def _bm25f_replay(field_docs, weights, queries, k1=1_200_000, b=750_000):
    """Pure-Python replay of bm25f_topk_micro: field_docs is a list of
    {doc: tokens} maps aligned with weights (milli)."""
    from fog_spark.operators.index import TFW_CAP_MILLI, tokenize_query

    all_docs = set().union(*[set(fd) for fd in field_docs])
    DL = {
        d: sum(w * len(fd.get(d, [])) for fd, w in zip(field_docs, weights))
        for d in all_docs
    }
    n = len(DL)
    avg = max(1, sum(DL.values()) // n) if n else 1
    out = {}
    for qid, q in enumerate(queries):
        scores = {}
        for t in tokenize_query(q):
            T = {}
            for fd, w in zip(field_docs, weights):
                for d, ts in fd.items():
                    tf = ts.count(t)
                    if tf:
                        T[d] = T.get(d, 0) + w * tf
            if not T:
                continue
            df = len(T)
            for d, traw in T.items():
                tt = min(traw, TFW_CAP_MILLI)
                r = (1000000 * DL[d]) // avg
                lnorm = 1000000 - b + (b * r) // 1000000
                K = (k1 * lnorm) // 1000000
                comp = (1000 * (tt * (k1 + 1000000))) // (1000 * tt + K)
                idf = (1000 * n) // df
                scores[d] = scores.get(d, 0) + (idf * comp) // 1000
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_bm25f_two_fields_match_replay(spark):
    from fog_spark.operators.index import bm25f_topk_micro

    body = {
        "u1": "spark engine overview and internals".split(),
        "u2": "cooking recipes and kitchen notes".split(),
        "u3": "misc page".split(),
    }
    anchor = {
        "u2": "spark spark tutorial".split(),  # anchors call u2 'spark'
        "u3": "spark".split(),
    }
    weights = [1000, 2500]
    queries = ["spark tutorial", "kitchen"]

    def field_frames(fd):
        p = spark.createDataFrame(
            [(t, d, ts.count(t)) for d, ts in fd.items() for t in set(ts)],
            "term string, doc_id string, tf long",
        )
        l = spark.createDataFrame(
            [(d, len(ts)) for d, ts in fd.items()], "doc_id string, dl long"
        )
        return p, l

    fields = [field_frames(body), field_frames(anchor)]
    got_rows = bm25f_topk_micro(fields, weights, queries, k=10).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score_micro"]))
    want = _bm25f_replay([body, anchor], weights, queries)
    assert got == {qid: lst for qid, lst in want.items() if lst}
    # the anchor-heavy page outranks the body-only page for 'spark tutorial'
    assert got[0][0][0] == "u2"


def test_anchor_field_from_links(spark):
    from fog_spark.operators.index import anchor_field

    links = spark.createDataFrame(
        [
            ("http://a.test/", "http://t.test/x", "Spark tutorial", False),
            ("http://b.test/", "http://t.test/x", "spark", False),
            ("http://c.test/", "http://t.test/x", "ignored", True),  # nofollow
            ("http://d.test/", "http://t.test/y", "   ", False),  # blank anchor
        ],
        "url string, dst_url string, anchor string, nofollow boolean",
    )
    p, l = anchor_field(links)
    tf = {(r["term"], r["doc_id"]): r["tf"] for r in p.collect()}
    assert tf == {
        ("spark", "http://t.test/x"): 2,
        ("tutorial", "http://t.test/x"): 1,
    }
    assert {r["doc_id"]: r["dl"] for r in l.collect()} == {"http://t.test/x": 3}


def test_idf_literal_survives_large_corpus(spark):
    """1000 * n_docs with n_docs > ~2.1M overflowed INT under ANSI when
    folded as int*int (found by tools/index_scale_probe at 4M docs) —
    the numerator is now a precomputed BIGINT literal."""
    from pyspark.sql import functions as F

    n = 4_000_000
    lengths = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(10).cast("long").alias("dl")
    )
    postings = spark.createDataFrame(
        [("alpha", 0, 3), ("alpha", 1, 1)], "term string, doc_id long, tf long"
    )
    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    rows = bm25_topk_micro(
        docs, ["alpha"], k=5, postings=postings, lengths=lengths
    ).collect()
    assert len(rows) == 2 and rows[0]["doc_id"] == 0
