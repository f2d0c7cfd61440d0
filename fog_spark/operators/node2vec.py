"""node2vec-biased walk corpus via deterministic rejection sampling.

Second-order walks (Grover & Leskovec, KDD'16): the step distribution
from ``cur`` depends on the previous vertex ``prev`` — candidates are
weighted 1/p (return to ``prev``), 1 (candidate is an out-neighbor of
``prev``), 1/q (otherwise). Exact alias-table sampling keys state on
every (prev, cur) PAIR — quadratic state that cannot ship at web scale —
so production walkers (e.g. KnightKing, SOSP'19) use REJECTION sampling
instead: draw a uniform out-edge, accept with probability alpha/alpha_max,
retry on reject. This module unrolls a BOUNDED number of trials per step
(``trials``); if every trial rejects, the walk deterministically takes
trial 1's candidate. The bound is part of the query contract (the oracle
unrolls the identical trials), and the acceptance bias it introduces
vanishes as trials grows — with the default p/q presets alpha/alpha_max
>= 1/16, so 3 trials already accept ~80%+ of steps.

Determinism (the property everything here is built around, matching
``operators.walks``): both the candidate pick and the acceptance draw
are hashes of (walk_id, step, trial, cur) — never RNG state — so the
corpus is a pure function of the edge set, independent of partitioning,
task order, and retries, and bit-identical across engines:

- pick:   idx = H(walk_id, t, r, cur) mod outdeg(cur)  (ascending-dst rank)
- accept: u32 = H'(salt, walk_id, t, r, cur) mod 2^32,
          accept iff  u32 * den < num * 2^32
  where num/den is the exact rational alpha/alpha_max of the candidate's
  class — INTEGER comparison, no float anywhere, so Spark and any SQL
  oracle agree bit-for-bit (p and q are capped to denominator <= 1000,
  keeping every product under 2^53).

Step 1 has no ``prev`` and is uniform (accept always), as in the paper.
Neighbor class uses OUT-neighbors of ``prev`` (directed link graph).
Dangling vertices absorb, exactly as in ``operators.walks``.

Scale shape: identical to ``random_walks`` — the pick joins the ranked
edge table ``(src, idx, dst, deg(dst))`` pinned by (src, idx), so hub
adjacency is spread row-wise across partitions; the membership test
joins the distinct edge set pinned by (src, dst). Each step is three
state-sized shuffles (pick join, membership join, winner agg) over
``trials x walks`` rows — never an edge-table shuffle — and the two
edge-side tables are materialized once and reused for every step.

Not in the reference (FOG's roadmap stops at graph algorithms,
/root/reference/TODO.list:16-21); this is the training-data extension
the north rule's corpus context asks for.
"""

from __future__ import annotations

from fractions import Fraction
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark import graph as G
from fog_spark.plans.materialize import _SER, Materializer

# acceptance-draw salt: keeps the accept hash stream disjoint from the
# pick hash stream over the same (walk_id, t, r, cur) tuple
_ACCEPT_SALT = "a"
_U32 = 1 << 32


def _ratios(p, q) -> tuple[tuple[int, int], tuple[int, int], tuple[int, int]]:
    """(num, den) of alpha/alpha_max for the return / neighbor / far
    classes, as exact reduced rationals. p and q are snapped to
    denominator <= 1000 so every integer product in the acceptance
    comparison stays far under 2^53 (num, den <= 10^6 < 2^20; the
    comparison multiplies by 2^32)."""
    P = Fraction(p).limit_denominator(1000)
    Q = Fraction(q).limit_denominator(1000)
    if P <= 0 or Q <= 0:
        raise ValueError("p and q must be positive")
    amax = max(Fraction(1), 1 / P, 1 / Q)
    out = []
    for alpha in (1 / P, Fraction(1), 1 / Q):
        r = alpha / amax
        # limit_denominator bounds P's and Q's denominators, NOT the
        # reduced ratio's: e.g. p = 10^12, q = 1 gives ret = 1/10^12,
        # whose u32 * den product overflows int64 under ANSI mode. The
        # acceptance comparison computes u32 * den and num * 2^32
        # (u32 < 2^32), so den and num must stay <= 10^6 (< 2^20) for
        # both products to stay under 2^52.
        if r.numerator > 1_000_000 or r.denominator > 1_000_000:
            raise ValueError(
                f"p={p}, q={q} reduce to acceptance ratio "
                f"{r.numerator}/{r.denominator}; numerator and denominator "
                "must each be <= 10^6 for exact int64 arithmetic — pick "
                "p, q in [10^-3, 10^3] with denominator <= 1000"
            )
        out.append((r.numerator, r.denominator))
    return tuple(out)


def _hash48(hash_fn: str, salt: str | None, step: int, extra_cols):
    """Non-negative hash column over (salt?, walk_id, step, trial, cur).

    md5 family: first 12 hex chars of md5("[salt:]walk_id:t:r:cur") —
    bit-portable to SQL engines. xxhash64 family: Spark-native, full
    signed range (callers pmod it)."""
    if hash_fn == "xxhash64":
        cols = [F.col("walk_id"), F.lit(step).cast("long"), *extra_cols]
        if salt is not None:
            # -7 is an arbitrary fixed long standing in for the salt
            cols = [F.lit(-7).cast("long")] + cols
        return F.xxhash64(*cols)
    if hash_fn == "md5":
        parts = [F.col("walk_id").cast("string"), F.lit(str(step))] + [
            c.cast("string") for c in extra_cols
        ]
        if salt is not None:
            parts = [F.lit(salt)] + parts
        s = F.concat_ws(":", *parts)
        return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 8,
    p=1,
    q=1,
    trials: int = 3,
    hash_fn: str = "xxhash64",
    walks_per_vertex: int = 1,
) -> DataFrame:
    """``(walk_id, step, vertex)`` — deterministic node2vec-biased walks;
    step 0 is the start vertex, one state row per walk throughout.
    ``walk_id = start * walks_per_vertex + j`` as in ``random_walks``.
    With p = q = 1 every class accepts at trial 1, reducing exactly to
    the uniform walk distribution (but NOT to ``random_walks`` values —
    the hash stream includes the trial index)."""
    if trials < 1:
        raise ValueError("trials must be >= 1")
    W = int(walks_per_vertex)
    if W < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    (ret_n, ret_d), (nb_n, nb_d), (far_n, far_d) = _ratios(p, q)

    spark = edges.sparkSession
    M = Materializer(spark)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = G.normalize_edges(edges).select("src", "dst")
    # one persisted degree frame feeds the ranked-build stats, the
    # deg(dst) join and the walk-state init (review finding; see
    # operators/walks.py), freed after the state checkpoint below
    deg0 = e.groupBy("src").agg(F.count("*").alias("_deg")).persist(_SER)
    deg = deg0.select(
        F.col("src").alias("_gsrc"), F.col("_deg").alias("_gdeg")
    )
    # ranked out-edges carrying deg(dst) — see operators/walks.py for why
    # persist (not localCheckpoint) keeps the (src, idx) partitioning
    # visible so every step's pick join plans with no edge-side exchange.
    # graph.ranked_out_edges is hub-safe (range-chunked two-phase rank
    # past hub_threshold) with byte-identical idx either way.
    ranked = (
        G.ranked_out_edges(e, deg=deg0)
        .select(
            F.col("src").alias("_rsrc"),
            F.col("dst").alias("_rdst"),
            F.col("idx").alias("_ridx"),
        )
        .join(deg, F.col("_rdst") == F.col("_gsrc"), "left")
        .select("_rsrc", "_rdst", "_ridx", F.col("_gdeg").alias("_rddeg"))
        .repartition(nparts, "_rsrc", "_ridx")
        .persist(_SER)
    )
    ranked.count()
    # distinct edge set for the neighbor-class membership probe,
    # pinned by its join key (prev, candidate)
    nbset = (
        e.distinct()
        .select(F.col("src").alias("_nsrc"), F.col("dst").alias("_ndst"))
        .withColumn("_nb", F.lit(1))
        .repartition(nparts, "_nsrc", "_ndst")
        .persist(_SER)
    )
    nbset.count()

    state = M.checkpoint(
        deg.select(
            F.explode(F.sequence(F.lit(0), F.lit(W - 1))).alias("_j"),
            F.col("_gsrc").alias("cur"),
            F.col("_gdeg").alias("_cdeg"),
        ).select(
            (F.col("cur") * W + F.col("_j")).cast("long").alias("walk_id"),
            F.lit(None).cast("long").alias("prev"),
            "cur",
            "_cdeg",
        )
    )
    deg0.unpersist()  # ranked + state are materialized; cache done
    snapshots = [state]
    for t in range(1, walk_len + 1):
        tr = state.withColumn(
            "_r", F.explode(F.sequence(F.lit(1).cast("long"), F.lit(trials).cast("long")))
        )
        pick = _hash48(hash_fn, None, t, [F.col("_r"), F.col("cur")])
        tr = tr.withColumn(
            "_idx",
            F.when(F.col("_cdeg").isNotNull(), F.pmod(pick, F.col("_cdeg"))),
        )
        cand = tr.join(
            ranked,
            (F.col("cur") == F.col("_rsrc")) & (F.col("_idx") == F.col("_ridx")),
            "left",
        ).join(
            nbset,
            (F.col("prev") == F.col("_nsrc")) & (F.col("_rdst") == F.col("_ndst")),
            "left",
        )
        num = (
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("_rdst") == F.col("prev"), F.lit(ret_n))
            .when(F.col("_nb").isNotNull(), F.lit(nb_n))
            .otherwise(F.lit(far_n))
            .cast("long")
        )
        den = (
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("_rdst") == F.col("prev"), F.lit(ret_d))
            .when(F.col("_nb").isNotNull(), F.lit(nb_d))
            .otherwise(F.lit(far_d))
            .cast("long")
        )
        u32 = F.pmod(
            _hash48(hash_fn, _ACCEPT_SALT, t, [F.col("_r"), F.col("cur")]),
            F.lit(_U32).cast("long"),
        )
        acc = F.col("_rdst").isNotNull() & (u32 * den < num * F.lit(_U32))
        # first accepted trial wins; if none accepts, trial 1's candidate
        key = F.when(acc, F.col("_r")).otherwise(F.lit(trials) + F.col("_r"))
        won = (
            cand.withColumn("_k", key)
            .groupBy("walk_id", "cur", "_cdeg")
            .agg(F.min_by(F.struct("_rdst", "_rddeg"), F.col("_k")).alias("_w"))
        )
        state = M.checkpoint(
            won.select(
                "walk_id",
                F.col("cur").alias("prev"),
                F.coalesce(F.col("_w._rdst"), F.col("cur")).alias("cur"),
                F.when(F.col("_w._rdst").isNotNull(), F.col("_w._rddeg"))
                .otherwise(F.col("_cdeg"))
                .alias("_cdeg"),
            )
        )
        snapshots.append(state)

    out = reduce(
        lambda a, b: a.unionByName(b),
        (
            s.select(
                "walk_id",
                F.lit(k).cast("long").alias("step"),
                F.col("cur").alias("vertex"),
            )
            for k, s in enumerate(snapshots)
        ),
    )
    result = M.checkpoint(out)
    for s in snapshots:
        M.free(s)
    ranked.unpersist()
    nbset.unpersist()
    return result
