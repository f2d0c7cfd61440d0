"""Winnowing document fingerprints — local substring-overlap detection.

Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003 — the MOSS algorithm): hash every char
k-gram, slide a window of w consecutive hashes, keep each window's
minimum. The guarantee: any substring match of length >= w + k - 1
between two documents shares at least one selected fingerprint, while
only ~2/(w+1) of all k-gram hashes are kept. This is the ROLLING-HASH
fingerprinting entry of the corpus checklist — the overlap detector
that catches partial plagiarism/quotation/template reuse that
whole-document MinHash (set semantics, order-blind) and exact line
dedup (line-aligned) both miss.

Spark shape: fingerprint selection is pure per-row Column math — an
O(n*k) ``transform`` hashing each k-gram, an O(n*w) window-min
transform, ``array_distinct``, then ONE explode + the usual capped
co-projection for pair detection: df cap first (a fingerprint present
in thousands of docs is boilerplate, not overlap — same discipline as
the shingle-df / fingerprint-df / dst-degree caps), equi-join after.
No all-pairs stage, no shuffle before the explode.

Evaluation trap this module codes around: higher-order-function lambdas
are INTERPRETED, and an array expression referenced inside a lambda is
re-evaluated per element — nesting "window mins over the k-gram-hash
transform" in one projection turns O(n*(k+w)) per row into O(n^2*k)
(measured ~1.3 s/doc on 300-char docs). Each array therefore
materializes as a real column in its own projection; the multiple
references then stop CollapseProject from re-inlining the expensive
expression into the next lambda.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.operators.text import _WS


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) — one row per distinct winnowing fingerprint per
    document. Any shared substring of length >= w + k - 1 (after
    normalization: lowercase, whitespace runs collapsed to one space —
    k-grams must survive reflow, not formatting) guarantees a shared fp
    row between the two docs. Docs shorter than one window keep their
    single global-min fingerprint; docs shorter than one k-gram yield
    no rows."""
    if k < 2 or w < 1:
        raise ValueError("need k >= 2 and w >= 1")
    # explicit ASCII whitespace class, not \s: Java's \s and Python's
    # Unicode \s disagree (VT, NBSP), and the pytest oracle must replay
    # normalization byte-for-byte (same trap as text.PRETOKEN_RE)
    norm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.col(text_col)), f"[{_WS}]+", " ").alias("_t"),
    )
    n_grams = F.length("_t") - F.lit(k - 1)
    hashed = norm.select(
        "doc_id",
        F.when(
            n_grams > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                lambda i: F.xxhash64(F.substring(F.col("_t"), i, k)),
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("_h"),
    )
    n_windows = F.size("_h") - F.lit(w - 1)
    mins = hashed.select(
        "doc_id",
        F.when(
            n_windows > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
                lambda i: F.array_min(F.slice(F.col("_h"), i, w)),
            ),
        )
        .when(F.size("_h") > 0, F.array(F.array_min("_h")))
        .otherwise(F.array().cast("array<bigint>"))
        .alias("_m"),
    )
    return mins.select("doc_id", F.explode(F.array_distinct("_m")).alias("fp"))


def winnow_overlap_pairs(
    docs: DataFrame, k: int = 8, w: int = 4,
    min_shared: int = 2, max_fp_df: int = 50,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, shared, size_a, size_b, overlap_permille) — document
    pairs (id_a < id_b) sharing >= ``min_shared`` winnowing fingerprints,
    ignoring fingerprints present in more than ``max_fp_df`` documents.
    overlap_permille = 1000 * shared / min(sizes) over KEPT fingerprints
    (containment of the smaller fingerprint set)."""
    # fps feeds both the df-cap aggregation and the semi-join lineage;
    # without a cache the O(n*(k+w)) per-row fingerprint pipeline runs
    # twice (plain persist — the no-materializer convention of
    # hostgraph.host_graph; one-shot callers leave cleanup to the session)
    fps = winnow_fingerprints(docs, k, w, text_col, id_col).persist()
    kept_fp = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= max_fp_df)
        .select("fp")
    )
    kept = fps.join(kept_fp, "fp", "left_semi")
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("sz"))
    l = kept.select("fp", F.col("doc_id").alias("id_a"))
    r = kept.select("fp", F.col("doc_id").alias("id_b"))
    pairs = (
        l.join(r, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("size_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("size_b")),
            "id_b",
        )
        .select(
            "id_a", "id_b", "shared", "size_a", "size_b",
            F.floor(F.col("shared") * 1000 / F.least("size_a", "size_b"))
            .cast("long")
            .alias("overlap_permille"),
        )
    )
