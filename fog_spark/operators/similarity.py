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


def lsh_signature(vec: Column, nplanes: int = 16, table: int = 0) -> Column:
    """Random-hyperplane signature: bit p = sign(vec . plane_p). Each
    table uses a disjoint set of planes (plane index offset by table)."""
    bits = []
    for p in range(nplanes):
        pid = table * 10_007 + p
        idx = F.sequence(F.lit(0), F.size(vec) - 1)
        dot = F.aggregate(
            F.zip_with(vec, idx, lambda x, d: x.cast("double") * _plane_component(F.lit(pid), d)),
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
    ntables: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine rerank within LSH buckets, using
    `ntables` independent hash tables (union of candidates). Recall =
    1-(1-p^nplanes)^ntables for per-bit agreement p — more tables raise
    recall, more planes shrink buckets/cost. One corpus scan emits all
    table buckets via a per-row explode; the probe side stays broadcast,
    so candidate generation is a map-side (broadcast-hash) join with no
    corpus shuffle. Returns the same schema as cosine_topk."""
    from pyspark.sql import Window

    def buckets(vec: Column) -> Column:
        return F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                lsh_signature(vec, nplanes, table=t).alias("b"),
            )
            for t in range(ntables)
        ])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(buckets(F.col(vec_col))).alias("bk"),
    ).select("neighbor_id", "cv", "bk.t", "bk.b")
    p = probes.select(
        "probe_id",
        F.col(vec_col).alias("pv"),
        F.explode(buckets(F.col(vec_col))).alias("bk"),
    ).select("probe_id", "pv", "bk.t", "bk.b")
    cand = (
        c.join(F.broadcast(p), ["t", "b"])
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", "cv", "pv")
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    sim = cand.select(
        "probe_id",
        "neighbor_id",
        (_dot(F.col("cv"), F.col("pv")) / (_norm(F.col("cv")) * _norm(F.col("pv")))).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return sim.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
