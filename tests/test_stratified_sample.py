"""Deterministic hash-based stratified sampling properties."""

from pyspark.sql import functions as F

from fog_spark.operators.sampling import stratified_sample

FRACS = {"en": 0.25, "de": 1.0, "fr": 0.0}


def _docs(spark, n=20000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_fractions_respected_approximately(spark):
    d = _docs(spark)
    kept = stratified_sample(d, "lang", FRACS, key="doc_id")
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("fr", 0) == 0
    assert counts["de"] == 5000  # fraction 1.0 keeps every row
    assert abs(counts["en"] - 2500) < 250  # 10000 * 0.25 +- 10%


def test_stable_under_repartitioning(spark):
    d = _docs(spark, 5000)
    a = {r.doc_id for r in stratified_sample(d, "lang", FRACS, key="doc_id").collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            d.repartition(7, "lang"), "lang", FRACS, key="doc_id"
        ).collect()
    }
    assert a == b


def test_default_fraction_for_unlisted_strata(spark):
    d = _docs(spark, 4000)
    kept = stratified_sample(
        d, "lang", {"de": 1.0}, key="doc_id", default_fraction=0.0
    )
    assert {r.lang for r in kept.select("lang").distinct().collect()} == {"de"}


def test_flat_fraction_and_joinable_samples(spark):
    d = _docs(spark, 8000)
    half = stratified_sample(d, "lang", 0.5, key="doc_id")
    n = half.count()
    assert abs(n - 4000) < 400
    # content-keyed: an independent pipeline sampling the same keys at the
    # same rate keeps EXACTLY the same rows
    other = stratified_sample(
        d.repartition(13).withColumn("extra", F.lit(1)), "lang", 0.5, key="doc_id"
    )
    assert {r.doc_id for r in other.collect()} == {r.doc_id for r in half.collect()}
