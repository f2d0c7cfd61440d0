"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
probe set against the corpus, dot products via zip_with/aggregate — all
JVM-side, no Python. The scale path is LSH bucketing (random-hyperplane
signatures with hash-derived deterministic planes): probes only meet
corpus vectors in their bucket, turning O(N*P) into O(P * bucket).
An IVF (k-means coarse quantizer) variant is the natural next step and
slots into the same bucket-join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fog_spark.hashing import pmod


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_topk(
    corpus: DataFrame, probes: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, neighbor_id, cosine, rank): exact brute force.
    probes: (probe_id, embedding). The probe side is broadcast — the corpus
    is scanned once regardless of probe count."""
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    p = probes.select(F.col("probe_id"), F.col(vec_col).alias("pv"))
    sim = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            (_dot(F.col("cv"), F.col("pv")) / (_norm(F.col("cv")) * _norm(F.col("pv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_component(p: Column, d: Column) -> Column:
    """Deterministic pseudo-random plane component in [-1, 1):
    hash-derived, reproducible across runs and languages."""
    return (pmod(F.xxhash64(p.cast("long") * 100_003 + d.cast("long")), F.lit(2000)) - 1000) / 1000.0


def lsh_signature(vec: Column, nplanes: int = 16) -> Column:
    """Random-hyperplane signature: bit p = sign(vec . plane_p)."""
    bits = []
    for p in range(nplanes):
        idx = F.sequence(F.lit(0), F.size(vec) - 1)
        dot = F.aggregate(
            F.zip_with(vec, idx, lambda x, d: x.cast("double") * _plane_component(F.lit(p), d)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_ann_topk(
    corpus: DataFrame, probes: DataFrame, k: int = 10, nplanes: int = 12,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact rerank within the probe's LSH bucket.
    Recall improves with fewer planes (bigger buckets); nplanes trades
    recall for cost. Returns same schema as cosine_topk."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_signature(F.col(vec_col), nplanes).alias("bucket"),
    )
    p = probes.select(
        "probe_id",
        F.col(vec_col).alias("pv"),
        lsh_signature(F.col(vec_col), nplanes).alias("bucket"),
    )
    sim = (
        c.join(F.broadcast(p), "bucket")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            (_dot(F.col("cv"), F.col("pv")) / (_norm(F.col("cv")) * _norm(F.col("pv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return sim.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
