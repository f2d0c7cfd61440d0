"""Deduplication operators for large-scale text corpora.

Beyond the reference (FOG has no text pipeline) but first-class for the
100 TB use case: exact dedup, MinHash+LSH, SimHash, n-gram Jaccard.
Everything is native Column expressions — hashing via xxhash64 (JVM,
codegen'd), shingling via higher-order array functions; no Python UDFs.

Scale notes:
- exact dedup: one shuffle (groupBy hash), map-side combine.
- minhash: k permutations computed as k affine transforms of ONE base
  shingle hash, aggregated as k min() columns in a single groupBy —
  one shuffle of (doc, hash) pairs, not k shuffles.
- LSH banding: candidates = self-join on (band_id, band_hash) buckets.
  Every pair-LISTING operator here carries a ``bucket_cap``: buckets
  larger than the cap switch from all-pairs to a deterministic
  id-ordered chain (each member pairs with its next ``chain_window``
  rank-neighbors), so a degenerate corpus — millions of identical
  boilerplate documents landing in ONE bucket of EVERY band — costs
  O(N * chain_window) candidate rows instead of O(N^2). AQE skew-join
  splitting only re-balances *tasks*; it cannot shrink quadratic
  *output*, hence the cap. Within an oversized bucket, pairs more than
  chain_window ranks apart are only reachable transitively — callers
  that want clusters (not pairs) should use :func:`near_dup_clusters`,
  whose star edges are O(N * bands) with NO recall loss.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fog_spark.hashing import pmod

# Mersenne prime 2^31-1: affine minhash family (a*h+b) mod p. The base
# hash is reduced mod p (< 2^31) before the affine transform, so
# a*h+b < 2^31 * 2^5 + 2^31 stays far below the long range even under
# ANSI overflow checking (a 61-bit modulus would overflow at a >= 4).
_MERSENNE31 = (1 << 31) - 1


def tokenize_col(text: Column) -> Column:
    """Lowercased word tokens (letters+digits runs) — array<string>."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


def shingle_col(text: Column, n: int = 3) -> Column:
    """n-gram word shingles as strings — array<string>, empty-safe."""
    toks = tokenize_col(text)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.when(count > 0, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(text_hash, keep_id, dup_count): smallest id survives per exact text.
    hash_fn 'xxhash64' (fast, default) or 'md5' (portable to SQL oracles)."""
    h = F.xxhash64(F.col(text_col)) if hash_fn == "xxhash64" else F.md5(F.col(text_col))
    return (
        docs.select(h.alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _affine_hashes(base: Column, num_hashes: int) -> list[Column]:
    """k pairwise-independent-ish hash transforms of one base hash.
    Coefficients are fixed odd constants (hash-derived at import would be
    equivalent; constants keep the SQL oracle expressible)."""
    cols = []
    for i in range(num_hashes):
        a = 2 * i + 1
        b = 1_000_003 * (i + 1)
        cols.append(pmod(base * F.lit(a) + F.lit(b), F.lit(_MERSENNE31)).alias(f"mh_{i}"))
    return cols


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — one shuffle: explode distinct shingles,
    hash once, take k affine mins in a single groupBy."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingle_col(F.col(text_col), shingle_n))).alias("sh"),
    )
    base = pmod(F.xxhash64(F.col("sh")), F.lit(_MERSENNE31))
    hashed = sh.select("id", *_affine_hashes(base, num_hashes))
    return hashed.groupBy("id").agg(
        *[F.min(f"mh_{i}").alias(f"mh_{i}") for i in range(num_hashes)]
    )


def _stack_bands(banded: DataFrame, bands: int) -> DataFrame:
    """Pivot (id, band_0..band_{B-1}) into (id, band, bh) rows."""
    return banded.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("e"),
    ).select("id", "e.band", "e.bh")


def _md5_banded(
    docs: DataFrame, text_col: str, id_col: str,
    num_hashes: int, bands: int, shingle_n: int,
) -> DataFrame:
    """(id, band_0..band_{B-1}) with the md5-STRING hash family — slower
    than xxhash64 but bit-portable to any SQL engine (DuckDB oracles
    replay it exactly). Signatures per-row via array_min/transform: zero
    shuffles before the band stage."""
    rpb = num_hashes // bands
    # stage the shingle array as a materialized column FIRST: inlining
    # the expression into each of the num_hashes min-hash columns plus
    # the size filter re-evaluates the whole tokenize + n-gram +
    # array_distinct pipeline ~(num_hashes+1)x per row (the interpreted
    # lambda re-evaluation trap winnow.py documents); as a multi-
    # referenced non-cheap alias it stays a separate projection
    # (SPARK-36718), evaluated once
    shingled = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingle_col(F.col(text_col), shingle_n)).alias("_sh"),
    ).where(F.size(F.col("_sh")) > 0)
    mh = [
        F.array_min(
            F.transform(F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{i} "), s)))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    sig = shingled.select("id", *mh)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh_{b * rpb + r}") for r in range(rpb)])).alias(f"band_{b}")
        for b in range(bands)
    ]
    return sig.select("id", *band_cols)


def _lsh_buckets(
    docs: DataFrame, text_col: str, id_col: str,
    num_hashes: int, bands: int, shingle_n: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, band, bh) — each doc's LSH bucket key per band. Docs whose
    shingle set is empty (texts shorter than one shingle) produce no
    rows: they can never near-dup-match anything. ``hash_fn``:
    "xxhash64" (production, bh is a long) or "md5" (SQL-oracle-portable,
    bh is a hex string)."""
    assert num_hashes % bands == 0
    if hash_fn == "md5":
        banded = _md5_banded(docs, text_col, id_col, num_hashes, bands, shingle_n)
        return _stack_bands(banded, bands)
    if hash_fn != "xxhash64":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (use 'xxhash64' or 'md5')")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.xxhash64(*cols).alias(f"band_{b}"))
    banded = sig.select("id", *band_cols)
    return _stack_bands(banded, bands)


def _capped_bucket_pairs(
    stacked: DataFrame, keys: list[str], extra: list[str],
    bucket_cap: int, chain_window: int,
) -> DataFrame:
    """(id_a, id_b[, <extra>_a, <extra>_b]) distinct pairs co-bucketed on
    ``keys``, with the degenerate-bucket guard (module docstring): buckets
    of size <= bucket_cap are exact all-pairs; larger buckets pair each
    member with its next ``chain_window`` neighbors in id order — an
    equi-join on (keys, rank), never a bucket-wide cross product, so an
    N-row bucket costs O(N * chain_window) candidates and its members
    stay transitively connected. Bucket sizes come from a groupBy (map-
    side combine: a degenerate bucket collapses to one row per map task)
    joined back, not a window count — the same single-task-sort trap
    lsh_star_edges documents. The per-bucket rank for oversized buckets
    IS a window sort, but only over rows already known oversized:
    O(N log N), spillable, strictly cheaper than the O(N^2) join it
    replaces (same trade similarity.embedding_near_dups makes)."""
    from pyspark.sql import Window

    # chain_window=0 would be "cap and drop", but F.sequence(rk+1, rk)
    # generates a DESCENDING [rk+1, rk] — each row would join to ITSELF
    # at its own rank, emitting (i, i) pairs that violate id_a < id_b
    # and could make a keep-one-of-each-pair consumer delete whole
    # buckets. Chaining is also what keeps oversized buckets
    # transitively connected, so a windowless cap has no valid use here.
    if chain_window < 1:
        raise ValueError(
            f"chain_window must be >= 1 (got {chain_window}): oversized "
            "buckets are connected via the id-ordered chain"
        )

    sizes = stacked.groupBy(*keys).agg(F.count("*").alias("_bsz"))
    sized = stacked.join(sizes, keys)

    def side(suffix: str) -> list[Column]:
        cols = [F.col("id").alias(f"id_{suffix}")]
        cols += [F.col(c).alias(f"{c}_{suffix}") for c in extra]
        return cols

    small = sized.where(F.col("_bsz") <= bucket_cap)
    cand_small = (
        small.select(*side("a"), *keys)
        .join(small.select(*side("b"), *keys), keys)
        .where(F.col("id_a") < F.col("id_b"))
    )

    big = sized.where(F.col("_bsz") > bucket_cap)
    w = Window.partitionBy(*keys).orderBy("id")
    ranked = big.select("id", *extra, *keys, F.row_number().over(w).alias("_rk"))
    probes = ranked.select(
        *side("a"), *keys,
        F.explode(F.sequence(F.col("_rk") + 1, F.col("_rk") + chain_window)).alias("_rk"),
    )
    targets = ranked.select(*side("b"), *keys, "_rk")
    # rank order == id order within the bucket, so id_a < id_b holds
    cand_big = probes.join(targets, [*keys, "_rk"])

    out = [f"{c}_{s}" for c in ["id", *extra] for s in ("a", "b")]
    return (
        cand_small.select(*out)
        .unionByName(cand_big.select(*out))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_candidates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, bands: int = 4, shingle_n: int = 3,
    bucket_cap: int = 2000, chain_window: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band.
    Buckets above ``bucket_cap`` degrade to the id-ordered chain (module
    docstring) — pair recall inside an oversized bucket is transitive
    only; use :func:`near_dup_clusters` when clusters are the goal."""
    stacked = _lsh_buckets(docs, text_col, id_col, num_hashes, bands, shingle_n)
    return _capped_bucket_pairs(
        stacked, ["band", "bh"], [], bucket_cap, chain_window
    ).select("id_a", "id_b")


def lsh_star_edges(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, bands: int = 4, shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(src, dst) spanning edges of the LSH-bucket co-membership graph:
    every bucket member links to the bucket's MIN id, never to each
    other.

    For *clustering* (as opposed to pair reporting) this is the scale
    move: a bucket of size k contributes k-1 edges instead of k(k-1)/2
    pairs, so a degenerate corpus (millions of identical documents — a
    crawl's boilerplate) costs O(N*bands) edges, never O(N^2), while the
    connected components of the star graph are EXACTLY the components of
    the all-pairs bucket graph (every member is connected through the
    bucket min; pytest pins the partition equality against a brute-force
    all-pairs union-find).

    Bucket minima via groupBy + join-back rather than a window min: the
    groupBy gets map-side partial aggregation (a degenerate bucket
    collapses to one row per map task before the exchange) and the
    join-back is a plain equi-join AQE can skew-split, whereas a window
    over (band, bh) would sort ALL copies of a hot bucket inside one
    task with no combine — the single-task trap every other degenerate
    guard here avoids. The bucket exchange is shared between the two
    branches (ReusedExchange).
    """
    stacked = _lsh_buckets(
        docs, text_col, id_col, num_hashes, bands, shingle_n, hash_fn
    )
    roots = stacked.groupBy("band", "bh").agg(F.min("id").alias("root"))
    return (
        stacked.join(roots, ["band", "bh"])
        .where(F.col("id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("id").alias("dst"))
        .distinct()
    )


def jaccard_on_pairs(
    docs: DataFrame, pairs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 3,
) -> DataFrame:
    """(id_a, id_b, jaccard) — EXACT shingle-set Jaccard computed only
    for the given candidate pairs (columns id_a, id_b). Intersection via
    a (pair x shingle) equi-join — cost is O(|pairs| * shingle overlap),
    never corpus-quadratic; set sizes ride a broadcast-friendly agg."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingle_col(F.col(text_col), shingle_n))).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    p = pairs.select("id_a", "id_b")
    inter = (
        p.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        p.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.coalesce(F.col("inter"), F.lit(0)).cast("double")
             / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0)))
             ).alias("jaccard"),
        )
    )


def near_dup_clusters(
    spark, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, bands: int = 4, shingle_n: int = 3,
    jaccard_threshold: float | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, cluster) — near-duplicate clusters over the whole corpus:
    MinHash -> LSH buckets -> star edges -> connected components
    (star-contraction CC, O(log n) rounds). cluster = min doc_id of the
    cluster; every input doc appears, singletons labeled by themselves.

    This is the composition a training-data pipeline actually runs
    ("collapse each near-dup cluster to one document"), in the shape
    production fuzzy-dedup systems use: bucket -> spanning edges -> CC,
    no all-pairs stage anywhere.

    ``jaccard_threshold``: if set, star edges are verified by EXACT
    shingle Jaccard and dropped below the threshold before CC. Note the
    standard approximation: verification applies to the spanning edges,
    not all bucket pairs, so two docs can land in one cluster through a
    chain of >=threshold neighbors (and a bucket-mate whose only star
    edge fails stays out even if some other bucket pair would pass).
    """
    from fog_spark.algos.cc_star import star_contraction_components

    edges = lsh_star_edges(
        docs, text_col, id_col, num_hashes, bands, shingle_n, hash_fn
    )
    if jaccard_threshold is not None:
        verified = jaccard_on_pairs(
            docs,
            edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b")),
            text_col, id_col, shingle_n,
        ).where(F.col("jaccard") >= jaccard_threshold)
        edges = verified.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    labels = star_contraction_components(spark, edges, vertices=all_ids)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )


def dedup_near(
    spark, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Corpus with each near-dup cluster collapsed to its min-id doc —
    one semi-join against the cluster keepers, schema preserved."""
    clusters = near_dup_clusters(spark, docs, text_col, id_col, **kw)
    keepers = clusters.where(F.col("doc_id") == F.col("cluster")).select("doc_id")
    return docs.join(
        keepers.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )


def minhash_md5_candidates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, bands: int = 4, shingle_n: int = 3,
    bucket_cap: int = 2000, chain_window: int = 8,
) -> DataFrame:
    """MinHash+LSH candidates with an md5-string hash family — slower than
    the xxhash64 version but bit-portable to any SQL engine (the driver's
    DuckDB oracle reproduces it exactly, INCLUDING the bucket cap+chain —
    the gate query runs with a cap small enough to trigger at sf0.01, so
    the degenerate-bucket path itself is hash-checked). Signatures are
    computed per-row with array_min/transform: zero shuffles until the
    band stage."""
    assert num_hashes % bands == 0
    stacked = _lsh_buckets(
        docs, text_col, id_col, num_hashes, bands, shingle_n, hash_fn="md5"
    )
    return _capped_bucket_pairs(
        stacked, ["band", "bh"], [], bucket_cap, chain_window
    ).select("id_a", "id_b")


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text",
    id_col: str = "doc_id", shingle_n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing >=1 shingle:
    (id_a, id_b, jaccard). The shingle self-join IS the candidate filter —
    disjoint docs never meet.

    ``max_shingle_df`` caps shingle document frequency BEFORE the
    self-join: a shingle shared by k docs contributes k^2/2 join rows, so
    one stop-shingle in 10^6 docs would explode to ~10^12 rows. Capped
    runs drop such shingles from BOTH the intersection and the per-doc
    sizes (the similarity signal of a near-universal shingle is ~zero, the
    standard corpus-dedup tradeoff); results stay deterministic and
    oracle-expressible since df is a deterministic aggregate."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingle_col(F.col(text_col), shingle_n))).alias("sh"),
    )
    if max_shingle_df is not None:
        df_ok = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_shingle_df)
            .select("sh")
        )
        sh = sh.join(df_ok, "sh")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.select(F.col("id").alias("id_a"), "sh")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def _simhash_sig(docs: DataFrame, text_col: str, id_col: str,
                 token_hash: Column, bits: int) -> DataFrame:
    """(id, simhash:long): per-token +/-w bit votes summed per doc, bit b
    set iff its vote sum is > 0. One shuffle (the (id, tok) tf groupBy),
    then per-id aggregation of `bits` conditional sums — map-side combine
    on both."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize_col(F.col(text_col))).alias("tok"),
    )
    tf = (
        toks.groupBy("id", "tok")
        .agg(F.count("*").alias("w"))
        .select("id", "w", token_hash.alias("h"))
    )
    bit_aggs = []
    for b in range(bits):
        bit_set = F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1
        bit_aggs.append(
            F.sum(F.when(bit_set, F.col("w")).otherwise(-F.col("w"))).alias(f"s_{b}")
        )
    sums = tf.groupBy("id").agg(*bit_aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).cast("long") * F.lit(1 << b).cast("long") if b < 63 else \
            F.when(F.col(f"s_{b}") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return sums.select("id", sig.alias("simhash"))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """(id, simhash:long) — 64-bit SimHash over xxhash64 token hashes,
    weighted by token frequency; all bit arithmetic JVM-side."""
    return _simhash_sig(docs, text_col, id_col, F.xxhash64(F.col("tok")), bits)


def simhash_md5(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """48-bit SimHash with an md5-derived token hash — bit-portable to SQL
    engines (h = first 12 md5 hex chars as a BIGINT, exact on both sides),
    so the driver's DuckDB oracle reproduces it hash-for-hash. simhash()
    (xxhash64) is the fast path for production runs."""
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long")
    return _simhash_sig(docs, text_col, id_col, h, 48)


def _chunk_band_pairs(
    sig: DataFrame, nchunks: int,
    bucket_cap: int = 2000, chain_window: int = 8,
) -> DataFrame:
    """Candidate pairs sharing >=1 exact 16-bit signature chunk — a
    bucketed equi-join (never all-pairs), with the degenerate-bucket
    cap+chain guard (module docstring): a crawl where millions of docs
    share a signature chunk pairs each member with its next
    ``chain_window`` id-neighbors instead of going O(N^2). Returns
    (id_a, id_b, simhash_a, simhash_b), id_a < id_b, distinct."""
    chunks = sig.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for c in range(nchunks)
        ])).alias("e"),
    ).select("id", "simhash", "e.chunk", "e.cv")
    return _capped_bucket_pairs(
        chunks, ["chunk", "cv"], ["simhash"], bucket_cap, chain_window
    )


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3,
    bucket_cap: int = 2000, chain_window: int = 8, **kw,
) -> DataFrame:
    """Candidate pairs with hamming(simhash) <= max_hamming, found via
    4x16-bit chunk banding (a pair within distance 3 shares >=1 exact
    chunk), then exact popcount verification. Chunks shared by more than
    ``bucket_cap`` docs degrade to the id-ordered chain — identical-doc
    floods stay O(N * chain_window); a pair in an oversized bucket more
    than chain_window ranks apart is missed (use near_dup_clusters for
    recall-lossless clustering)."""
    cand = _chunk_band_pairs(
        simhash(docs, **kw), nchunks=4,
        bucket_cap=bucket_cap, chain_window=chain_window,
    )
    ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def simhash_md5_near_dups(
    docs: DataFrame, max_hamming: int = 2,
    bucket_cap: int = 2000, chain_window: int = 8, **kw,
) -> DataFrame:
    """Oracle-portable twin of simhash_near_dups: 48-bit md5 signatures,
    3x16-bit chunk banding (full recall for hamming <= 2 by pigeonhole
    WHEN no bucket exceeds ``bucket_cap``; oversized buckets chain),
    exact popcount verification. Every step — including the cap+chain —
    is deterministic integer math reproducible in ANSI-ish SQL, so the
    driver hash-checks it (the gate runs cap=16 which sf0.01's hottest
    28-doc chunk bucket exceeds: the chain path is under the oracle)."""
    cand = _chunk_band_pairs(
        simhash_md5(docs, **kw), nchunks=3,
        bucket_cap=bucket_cap, chain_window=chain_window,
    )
    ham = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
