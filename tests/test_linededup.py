"""Corpus-wide line dedup (CCNet-style boilerplate removal) vs a
brute-force Python oracle."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from fog_spark.operators.linededup import (
    frequent_lines,
    line_df,
    remove_duplicated_lines,
)

BOILER = "ACCEPT COOKIES TO CONTINUE"
FOOTER = "(c) example site 2026"

DOCS = [
    (0, f"{BOILER}\nunique zero alpha\n{FOOTER}", "en"),
    (1, f"{BOILER}\nunique one beta\nunique one gamma\n{FOOTER}", "en"),
    (2, f"unique two delta\n{BOILER}", "de"),
    (3, "all original text here\nnothing shared at all", "de"),
    (4, f"{BOILER}\n{FOOTER}", "en"),  # pure boilerplate -> empty
    (5, "", "fr"),  # empty doc must survive with 0/0 counts
    (6, f"repeated inside\nrepeated inside\nunique six", "fr"),
]


def _oracle(min_df):
    """Brute-force: df per distinct-per-doc line, strip lines with
    df >= min_df from every doc, rejoin with newline."""
    df = Counter()
    for _, text, _ in DOCS:
        for line in set(l for l in text.split("\n") if l):
            df[line] += 1
    out = {}
    for doc_id, text, lang in DOCS:
        lines = [l for l in text.split("\n") if l]
        kept = [l for l in lines if df[l] < min_df]
        removed = len(lines) - len(kept)
        out[doc_id] = ("\n".join(kept), len(kept), removed, lang)
    return df, out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_line_df_counts(spark, docs):
    exp_df, _ = _oracle(2)
    got = {r["line_hash"]: r["df"] for r in line_df(docs).collect()}
    # map expected line -> hash via Spark itself (xxhash64 not in Python)
    hashes = {
        r["line"]: r["h"]
        for r in spark.createDataFrame(
            [(l,) for l in exp_df], "line string"
        ).select("line", F.xxhash64("line").alias("h")).collect()
    }
    assert got == {hashes[l]: c for l, c in exp_df.items()}


@pytest.mark.parametrize("min_df", [2, 3])
def test_remove_duplicated_lines_matches_oracle(spark, docs, min_df):
    _, exp = _oracle(min_df)
    rows = remove_duplicated_lines(docs, min_df=min_df).collect()
    assert len(rows) == len(DOCS)
    for r in rows:
        text, kept, removed, lang = exp[r["doc_id"]]
        assert r["text"] == text, r["doc_id"]
        assert r["n_lines_kept"] == kept
        assert r["n_lines_removed"] == removed
        assert r["lang"] == lang  # non-text columns preserved


def test_within_doc_repetition_not_boilerplate(spark, docs):
    # "repeated inside" occurs twice in doc 6 but in no other doc:
    # df counts documents, so min_df=2 must NOT remove it
    rows = {r["doc_id"]: r for r in remove_duplicated_lines(docs, min_df=2).collect()}
    assert "repeated inside" in rows[6]["text"]
    assert rows[6]["n_lines_removed"] == 0


def test_pure_boilerplate_and_empty_docs_survive(spark, docs):
    rows = {r["doc_id"]: r for r in remove_duplicated_lines(docs, min_df=2).collect()}
    assert rows[4]["text"] == "" and rows[4]["n_lines_kept"] == 0
    assert rows[4]["n_lines_removed"] == 2
    assert rows[5]["text"] == "" and rows[5]["n_lines_kept"] == 0
    assert rows[5]["n_lines_removed"] == 0


def test_min_df_1_rejected(spark, docs):
    with pytest.raises(ValueError):
        remove_duplicated_lines(docs, min_df=1)


def test_frequent_lines_report(spark, docs):
    rows = frequent_lines(docs, k=10, min_df=2).collect()
    got = [(r["line"], r["df"]) for r in rows]
    assert got[0] == (BOILER, 4)
    assert (FOOTER, 3) in got
    assert all(df >= 2 for _, df in got)


def test_real_corpus_roundtrip(spark):
    # package boundary over real parquet: no line shared across >= 3 of
    # the synthetic docs (they're generated unique), so a high threshold
    # must be a no-op on text content
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = remove_duplicated_lines(docs, min_df=3)
    assert out.count() == docs.count()
    joined = (
        docs.select("doc_id", F.col("text").alias("orig"))
        .join(out.select("doc_id", "text", "n_lines_removed"), "doc_id")
    )
    changed = joined.where(F.col("n_lines_removed") > 0).count()
    assert changed == 0
    # reassembly preserves content modulo empty-line collapse
    same = joined.where(
        F.array_join(
            F.filter(F.split("orig", r"\n"), lambda x: F.length(x) > 0), "\n"
        )
        == F.col("text")
    ).count()
    assert same == joined.count()
