"""Pins FIXTURES F1/F2: Spark generator == Python oracle; extraction is
byte-identical per url (input_hint); the extraction edge path == the rule
edge path; native and pandas-UDF extractors agree."""

from pyspark.sql import functions as F

from fog_spark.functions.extract import (
    assign_dense_ids,
    edges_from_pages,
    extract_outlinks_col,
    extract_pages_udf,
    extract_text_col,
)
from fog_spark.sources.pages import (
    edges_rows,
    generate_edges,
    generate_pages,
    pages_rows,
)

N = 100


def test_generator_matches_python_oracle(spark):
    got = {r["url"]: r for r in generate_pages(spark, N).collect()}
    for want in pages_rows(N):
        g = got[want["url"]]
        assert bytes(g["html"]) == want["html"]
        assert g["text"] == want["text"]
        assert g["lang"] == want["lang"]
    assert len(got) == N


def test_extracted_text_byte_identical(spark):
    pages = generate_pages(spark, N)
    bad = pages.where(
        F.encode(extract_text_col(F.col("html")), "UTF-8") != F.col("text").cast("binary")
    ).count()
    assert bad == 0


def test_udf_extractor_agrees_with_native(spark):
    pages = generate_pages(spark, N).cache()
    native = pages.select(
        "url",
        extract_text_col(F.col("html")).alias("text"),
        extract_outlinks_col(F.col("html")).alias("outlinks"),
    )
    viaudf = extract_pages_udf(pages)
    n = native.orderBy("url").collect()
    u = viaudf.orderBy("url").collect()
    assert [tuple(r) for r in n] == [tuple(r) for r in u]
    pages.unpersist()


def test_edges_from_pages_equals_rule(spark):
    pages = generate_pages(spark, N)
    via_html = edges_from_pages(pages).orderBy("src", "dst", "weight").collect()
    via_rule = generate_edges(spark, N).orderBy("src", "dst", "weight").collect()
    assert [tuple(r) for r in via_html] == [tuple(r) for r in via_rule]
    want = sorted(edges_rows(N))
    assert sorted(tuple(r) for r in via_rule) == want


def test_assign_dense_ids(spark):
    pages = generate_pages(spark, N)
    ids = assign_dense_ids(pages.select("url"), partitions=4).collect()
    got = sorted(r["id"] for r in ids)
    assert got == list(range(N))
    # deterministic: ids follow url sort order
    by_url = sorted(ids, key=lambda r: r["url"])
    assert [r["id"] for r in by_url] == list(range(N))


def test_edges_from_pages_resolve_equals_raw(spark):
    # fixture hrefs are already absolute + canonical, so the urlnorm
    # path (resolve=True) must produce the identical edge table
    pages = generate_pages(spark, N)
    raw = edges_from_pages(pages).orderBy("src", "dst", "weight").collect()
    res = edges_from_pages(pages, resolve=True).orderBy("src", "dst", "weight").collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in res]
