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


def _cosine(a: Column, b: Column) -> Column:
    """Cosine with a zero-norm guard: an all-zero vector (empty
    document, padding row) has undefined cosine — score it 0.0 (never
    similar) instead of letting Spark 4's default ANSI mode throw
    DIVIDE_BY_ZERO and kill the whole job on one degenerate row
    (_unit already guards the identical case)."""
    na, nb = _norm(a), _norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        _dot(a, b) / (na * nb)
    )


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
            _cosine(F.col("cv"), F.col("pv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _unit(a: Column) -> Column:
    n = _norm(a)
    return F.transform(a, lambda x: x.cast("double") / F.when(n > 0, n).otherwise(F.lit(1.0)))


def ivf_train(
    corpus: DataFrame, ncells: int = 64, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_cap: int = 100_000,
) -> list[list[float]]:
    """Spherical k-means coarse quantizer; returns the centroid list
    (driver-side: ncells x dim doubles — a few MB at most, the classic
    IVF codebook that ships to every executor as literals).

    Deterministic: seeds are the ``ncells`` hash-smallest vectors, Lloyd
    runs a fixed ``iters`` sweeps. Trains on a hash-sampled subset capped
    at ``train_cap`` rows — quantizer quality needs a sample, not the
    corpus (standard IVF practice), so training cost is O(train_cap *
    ncells) regardless of corpus size."""
    n = corpus.count()
    frac_mod = max(1, n // train_cap)
    train = (
        corpus.where(pmod(F.xxhash64(F.col(id_col)), F.lit(frac_mod)) == 0)
        .select(F.col(id_col).alias("id"), _unit(F.col(vec_col)).alias("v"))
    )
    train = train.persist()
    seeds = (
        train.orderBy(pmod(F.xxhash64(F.col("id") * 31 + 7), F.lit(1 << 20)), "id")
        .limit(ncells)
        .collect()
    )
    cents = [list(r["v"]) for r in seeds]
    for _ in range(iters):
        lit_cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
        cell = _best_cell(F.col("v"), lit_cents, len(cents))
        sums = (
            train.select(cell.alias("cell"), F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ).alias("sum_v"),
            )
            .collect()
        )
        by_cell = {int(r["cell"]): r["sum_v"] for r in sums}
        new_cents = []
        for j, old in enumerate(cents):
            sv = by_cell.get(j)
            if sv is None:  # empty cell keeps its seed
                new_cents.append(old)
                continue
            norm = sum(x * x for x in sv) ** 0.5 or 1.0
            new_cents.append([x / norm for x in sv])
        cents = new_cents
    train.unpersist()
    return cents


def _best_cell(vec: Column, lit_cents: Column, ncells: int) -> Column:
    """argmax_j dot(vec, centroid_j) as one codegen'd expression — zero
    shuffle, zero join for assignment (ties -> smallest j via the
    lexicographic struct max over (dot, -j))."""
    dots = F.transform(
        F.sequence(F.lit(0), F.lit(ncells - 1)),
        lambda j: _dot(vec, F.element_at(lit_cents, j + 1)),
    )
    # first occurrence of the max -> smallest j on ties (struct field
    # names don't survive transform lambdas, hence position not max_by)
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_ann_topk(
    corpus: DataFrame, probes: DataFrame, k: int = 10, ncells: int = 64,
    nprobe: int = 4, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    k-means centroid (one pass, expression-only assignment), probes visit
    their ``nprobe`` nearest cells, exact cosine reranks inside. The
    probe-cell join is an equi-join on cell with the probe side broadcast,
    so cost is O(|corpus| * nprobe / ncells) per probe instead of
    O(|corpus|) — the scan-fraction knob the LSH variant lacks. Same
    output schema as cosine_topk."""
    from pyspark.sql import Window

    if centroids is None:
        centroids = ivf_train(corpus, ncells, iters, id_col, vec_col)
    lit_cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    nc = len(centroids)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _best_cell(_unit(F.col(vec_col)), lit_cents, nc).alias("cell"),
    )
    # probes: top-nprobe cells each (probe count is small; window is fine)
    pc = (
        probes.select("probe_id", F.col(vec_col).alias("pv"))
        .select(
            "probe_id", "pv",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(nc - 1)),
                    lambda j: F.struct(
                        j.cast("int").alias("cell"),
                        _dot(_unit(F.col("pv")), F.element_at(lit_cents, j + 1)).alias("cd"),
                    ),
                )
            ).alias("e"),
        )
        .select("probe_id", "pv", "e.cell", "e.cd")
    )
    wp = Window.partitionBy("probe_id").orderBy(F.col("cd").desc(), F.col("cell"))
    pc = pc.withColumn("_r", F.row_number().over(wp)).where(F.col("_r") <= nprobe)

    cand = (
        c.join(F.broadcast(pc.select("probe_id", "pv", "cell")), "cell")
        .where(F.col("neighbor_id") != F.col("probe_id"))
    )
    sim = cand.select(
        "probe_id",
        "neighbor_id",
        _cosine(F.col("cv"), F.col("pv")).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return sim.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dups_exact(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id_a < id_b, cosine) for every pair with cosine >= threshold —
    exact all-pairs verifier (O(N^2)/2; the small-scale oracle twin of
    :func:`embedding_near_dups`, same role the exact Jaccard plays for
    MinHash). Norms are precomputed once per side."""
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.when((F.col("na") == 0) | (F.col("nb") == 0), F.lit(0.0))
        .otherwise(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95, nplanes: int = 8, ntables: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_cap: int = 2000, chain_window: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine — the scale path:
    candidates from ``ntables`` hyperplane-LSH band buckets (self-join on
    (table, signature) — pairs at cosine c collide per table with
    probability (1 - arccos(c)/pi)^nplanes, so near-dups almost surely
    share a bucket somewhere), exact cosine verification inside. No
    all-pairs stage; the bucket self-join is the candidate bound, same
    shape as MinHash-LSH dedup.

    Degenerate-bucket guard (the analog of the shingle-df cap,
    dedup.py: a crawl with millions of byte-identical embeddings puts
    them ALL in the same bucket of EVERY table, and the plain self-join
    goes O(N^2)): buckets larger than ``bucket_cap`` switch from
    all-pairs to a deterministic id-ordered CHAIN — each row pairs with
    its next ``chain_window`` neighbors by rank within the bucket (an
    equi-join on (t, b, rank), never a bucket-wide cross product), so an
    N-row bucket costs O(N * chain_window) candidates while duplicate
    clusters stay transitively connected for the downstream
    connected-components/keep-min consumer. Trade-off (documented, not
    silent): inside an oversized bucket, a pair more than chain_window
    ranks apart is only found transitively — exact pairwise recall drops
    for mixed oversized buckets, component-level recall survives.
    Buckets at or below the cap are exact all-pairs, so small-scale
    results are unchanged (pytest pins equality with the exact twin).
    The chain's per-bucket rank is a window sort — one task per
    oversized bucket, O(N log N) and spillable (vs the O(N^2) join it
    replaces); the chain join itself is an equi-join AQE can skew-split."""
    sigs = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_signature(F.col(vec_col), nplanes, table=t).alias("b"),
                )
                for t in range(ntables)
            ])
        ).alias("bk"),
    ).select("id", "v", "bk.t", "bk.b")
    # the cap + id-ordered-chain candidate shape is shared with the
    # MinHash/SimHash pair-listing ops — one implementation, one place
    # to fix (it also carries the chain_window >= 1 guard)
    from fog_spark.operators.dedup import _capped_bucket_pairs

    cand = _capped_bucket_pairs(
        sigs.select("id", "v", "t", "b"), ["t", "b"], ["v"],
        bucket_cap, chain_window,
    )
    pairs = cand.select(
        "id_a",
        "id_b",
        _cosine(F.col("v_a"), F.col("v_b")).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)


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
        _cosine(F.col("cv"), F.col("pv")).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return sim.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
