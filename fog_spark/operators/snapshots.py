"""Multi-capture (snapshot) handling for Common-Crawl-style pages.

A real crawl table carries the SAME url many times — one row per capture
(``warc_ts``). Every batch analysis upstream of this module assumes one
row per url, so the first production step is snapshot collapse; and the
capture history itself is the input to recrawl scheduling (Cho &
Garcia-Molina, "Synchronizing a database to improve freshness", 2000:
refresh frequency should track observed change frequency).

Scale shape: snapshot collapse is ONE hash aggregation keyed by url
with map-side partial aggregation — ``max_by`` keeps a single struct
per group (no window, no sort). The change stats additionally need
capture ORDER for the transition count, so they are one bounded-
partition window (url × its few captures) feeding one hash
aggregation. No joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAYLOAD = ("warc_ts", "html", "text", "lang")


def latest_snapshots(pages: DataFrame) -> DataFrame:
    """One row per url: the latest capture by ``warc_ts``; exact-tie
    captures (same url, same timestamp) break deterministically by the
    larger xxhash64 of the html bytes (or of text when the table has no
    html column), so the result is a pure function of the table
    contents under any partitioning."""
    cols = [c for c in _PAYLOAD if c in pages.columns]
    tie = [F.col("warc_ts")]
    if "html" in pages.columns:
        tie.append(F.xxhash64(F.col("html")))
    elif "text" in pages.columns:
        tie.append(F.xxhash64(F.col("text")))
    picked = pages.groupBy("url").agg(
        F.max_by(F.struct(*cols), F.struct(*tie)).alias("_s")
    )
    return picked.select("url", *[F.col(f"_s.{c}").alias(c) for c in cols])


def page_change_stats(pages: DataFrame) -> DataFrame:
    """Per-url capture history summary for recrawl scheduling:
    ``(url, n_captures, n_versions, n_changes, first_ts, last_ts,
    change_ratio)`` where ``n_versions`` counts DISTINCT text contents
    (md5), ``n_changes`` counts consecutive-capture TRANSITIONS whose
    content differs (the Cho & Garcia-Molina "X": an oscillating
    A,B,A,B history has 2 versions but a change in every interval —
    distinct-count undercounts it), and ``change_ratio = n_changes /
    greatest(n_captures - 1, 1)`` — 0.0 for a page that never changed,
    1.0 for one that changed every capture. Single-capture urls get
    ratio 0.0.

    Shape note: the transition count needs capture order, so this is
    one window (partition url, order warc_ts + content-hash tie-break;
    per-url partitions are capture-history-sized, bounded) feeding one
    hash aggregation."""
    from pyspark.sql.window import Window

    # NULL text (failed extraction) counts as its own version: coalesce
    # before hashing, or count_distinct drops the rows and the ratio
    # can go negative on all-NULL histories
    vh = F.md5(F.coalesce(F.col("text"), F.lit("\0null\0")).cast("binary"))
    w = Window.partitionBy("url").orderBy(F.col("warc_ts"), vh)
    changed = (
        F.lag(vh).over(w).isNotNull() & (vh != F.lag(vh).over(w))
    ).cast("long")
    return (
        pages.withColumn("_vh", vh)
        .withColumn("_chg", changed)
        .groupBy("url")
        .agg(
            F.count("*").alias("n_captures"),
            F.count_distinct(F.col("_vh")).alias("n_versions"),
            F.sum("_chg").alias("n_changes"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
            (
                F.sum("_chg") / F.greatest(F.count("*") - 1, F.lit(1))
            ).alias("change_ratio"),
        )
    )


def _tagged_edge_union(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """(src, dst, _mn, _mx) — both distinct edge sets tagged (old=1,
    new=2), unioned, one hash aggregate keyed by (src, dst): the shared
    single-shuffle core of edge_delta and edge_delta_stats (_mn == _mx
    means the edge exists on only one side)."""
    tag0 = edges_old.select("src", "dst").distinct().select(
        "src", "dst", F.lit(1).alias("_t")
    )
    tag1 = edges_new.select("src", "dst").distinct().select(
        "src", "dst", F.lit(2).alias("_t")
    )
    return tag0.unionByName(tag1).groupBy("src", "dst").agg(
        F.min("_t").alias("_mn"), F.max("_t").alias("_mx")
    )


def edge_delta(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """Crawl-to-crawl link diff: ``(src, dst, change)`` with change in
    {'added', 'removed'} over the DISTINCT edge sets of two captures of
    the same graph (multi-edge multiplicity changes are not changes to
    link existence). Both inputs must share one vertex-id space — use
    the same url dictionary for both extractions.

    This is the input a warm-started PageRank refresh
    (algos.pagerank.WarmStartPageRank) wants to LOOK AT before running:
    |delta| / |E| bounds the distance of the stale ranks from the new
    fixpoint, so a scheduler can skip the refresh when nothing moved.

    Scale shape: ONE shuffle — tag each side, union, one hash aggregate
    keyed by (src, dst) with map-side combine; edges present on both
    sides (the overwhelming majority, crawl-over-crawl) collapse to
    'unchanged' in the partial aggregates and are filtered before the
    result materializes. No anti-join pair (two shuffles), no driver
    collect.
    """
    both = _tagged_edge_union(edges_old, edges_new)
    return both.where(F.col("_mn") == F.col("_mx")).select(
        "src",
        "dst",
        F.when(F.col("_mn") == 1, F.lit("removed"))
        .otherwise(F.lit("added"))
        .alias("change"),
    )


def edge_delta_stats(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """One-row summary of :func:`edge_delta`:
    ``(n_added, n_removed, n_unchanged, churn)`` where
    ``churn = (n_added + n_removed) / greatest(n_old_distinct, 1)`` —
    the refresh-scheduling signal (skip the PageRank refresh below a
    churn threshold). Same single-shuffle plan as edge_delta, summed."""
    both = _tagged_edge_union(edges_old, edges_new)
    return both.agg(
        F.sum(F.when((F.col("_mn") == 2) & (F.col("_mx") == 2), 1).otherwise(0))
        .cast("long")
        .alias("n_added"),
        F.sum(F.when((F.col("_mn") == 1) & (F.col("_mx") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(F.when(F.col("_mn") < F.col("_mx"), 1).otherwise(0))
        .cast("long")
        .alias("n_unchanged"),
    ).select(
        "n_added",
        "n_removed",
        "n_unchanged",
        (
            (F.col("n_added") + F.col("n_removed"))
            / F.greatest(F.col("n_removed") + F.col("n_unchanged"), F.lit(1))
        ).alias("churn"),
    )


def recrawl_schedule(
    change_stats: DataFrame,
    min_hours: float = 1.0,
    max_hours: float = 24.0 * 30,
    default_hours: float = 24.0 * 7,
) -> DataFrame:
    """(url, lambda_per_day, recrawl_hours) — per-url revisit intervals
    from capture history, the Cho & Garcia-Molina estimator (TOIT 2003,
    "Estimating frequency of change"): with n = n_captures - 1 observed
    intervals and X = n_changes detected changes (per-interval
    transitions, NOT distinct versions — an oscillating A,B,A,B page
    changes every interval), the bias-corrected
    change rate per interval is r = -ln((n - X + 0.5) / (n + 0.5));
    divided by the mean capture interval it becomes a Poisson rate
    lambda, and the uniform revisit policy fetches at interval 1/lambda
    (clamped to [min_hours, max_hours]). Single-capture urls (nothing
    observed) get ``default_hours``; never-changed urls get
    ``max_hours``. Float scores pinned by a pure-Python replay (same
    precedent as betweenness_sampled: ln is order-independent here, one
    value per row, so no gate slot is claimed).

    This closes the snapshots chain: page_change_stats measures, this
    schedules, crawl_frontier fetches. One row per url, pure Column
    math over the stats frame — no shuffle at all."""
    n = F.col("n_captures") - 1
    x = F.col("n_changes")
    span_s = (
        F.col("last_ts").cast("double") - F.col("first_ts").cast("double")
    )
    # mean capture interval; guard zero spans (all captures same instant)
    avg_s = F.when(n > 0, span_s / n).otherwise(F.lit(None))
    r = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5)))
    lam_day = F.when(
        (n > 0) & (avg_s > 0), r / avg_s * F.lit(86400.0)
    ).otherwise(F.lit(None))
    ideal_h = F.when(lam_day > 0, F.lit(24.0) / lam_day)
    hours = (
        F.when(n <= 0, F.lit(float(default_hours)))
        .when(lam_day.isNull() | (lam_day <= 0), F.lit(float(max_hours)))
        .otherwise(
            F.least(
                F.greatest(ideal_h, F.lit(float(min_hours))),
                F.lit(float(max_hours)),
            )
        )
    )
    return change_stats.select(
        "url",
        lam_day.alias("lambda_per_day"),
        hours.alias("recrawl_hours"),
    )
