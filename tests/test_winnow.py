"""Winnowing fingerprints vs a pure-Python replay of Schleimer et al.,
plus the guarantee property and the overlap pair detector."""

import re

import pytest

from fog_spark.hashing import xxhash64
from fog_spark.operators.winnow import winnow_fingerprints, winnow_overlap_pairs

K, W = 8, 4


def _norm(text):
    # explicit ASCII class matching the operator (Python's \s is Unicode
    # and would diverge from Java's on NBSP; Java's \s has VT, RE2's not)
    return re.sub(r"[ \t\n\x0B\f\r]+", " ", text.lower())


def _py_winnow(text, k=K, w=W):
    t = _norm(text)
    hashes = [xxhash64(t[i : i + k]) for i in range(len(t) - k + 1)]
    if not hashes:
        return set()
    if len(hashes) < w:
        return {min(hashes)}
    return {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}


SHARED = "the quick brown fox jumps over the lazy dog"
DOCS = [
    (0, f"Intro text A. {SHARED}. Outro A."),
    (1, f"Completely different framing here; {SHARED}! And more."),
    (2, "No overlap with anything else in this corpus at all, promise."),
    (3, "tiny"),  # shorter than one window, >= one k-gram
    (4, "ab"),  # shorter than one k-gram -> no fingerprints
    # NBSP must survive normalization (not ASCII whitespace) and VT must
    # collapse — pins Spark/Python agreement on the explicit class
    (5, "nbsp kept\x0bvt collapsed, wholly unique filler phrase"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_oracle(spark, docs):
    got = {}
    for r in winnow_fingerprints(docs, K, W).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id


def test_guarantee_shared_substring_shares_fp(spark, docs):
    # |SHARED| = 43 >= w + k - 1 = 11: docs 0 and 1 MUST share a fp
    fps = {}
    for r in winnow_fingerprints(docs, K, W).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]
    assert not (fps[0] & fps[2])


def test_overlap_pairs(spark, docs):
    rows = winnow_overlap_pairs(docs, K, W, min_shared=2, max_fp_df=10).collect()
    got = {(r["id_a"], r["id_b"]): r for r in rows}
    assert set(got) == {(0, 1)}
    r = got[(0, 1)]
    assert r["shared"] >= 2
    assert 0 < r["overlap_permille"] <= 1000
    assert r["overlap_permille"] == 1000 * r["shared"] // min(r["size_a"], r["size_b"])


def test_df_cap_drops_boilerplate_fp(spark):
    # the same text in 6 docs + one genuine pair: cap 5 kills the
    # boilerplate fingerprints, so only the pair with unique overlap stays
    boiler = [(i, "identical boilerplate body repeated everywhere") for i in range(6)]
    pair = [
        (10, f"unique leader. {SHARED}."),
        (11, f"{SHARED}? unique trailer."),
    ]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(docs, K, W, min_shared=2, max_fp_df=5).collect()
    }
    assert got == {(10, 11)}


def test_bad_params_rejected(spark, docs):
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=1)
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, w=0)
