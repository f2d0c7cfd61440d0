"""Corpus-wide line (paragraph) deduplication — boilerplate removal.

CCNet (Wenzek et al., LREC 2020) and RefinedWeb (Penedo et al., 2023)
both strip lines that repeat across many documents BEFORE document-level
dedup: navigation menus, cookie banners, footers — the text that makes
every page of a site look like every other page and poisons both quality
scores and MinHash signatures. Not in the reference (its roadmap stops
at graph algorithms, /root/reference/TODO.list:16-21); standard
published corpus-prep semantics.

Scale shape (the part that matters at 100 TB):

- one ``posexplode`` of documents into (doc, pos, line) rows — a
  projection, no shuffle;
- line document-frequency via ONE ``groupBy(line_hash)`` with map-side
  partial aggregation (a line duplicated 10^8 times combines to one row
  per map task before the exchange);
- a hash equi-join of the line rows against the (hash, df) table —
  skew-safe: each line row matches exactly one df row, so a hot hash
  fans out across tasks instead of collapsing into one (the Window
  alternative — ``count over partitionBy(line_hash)`` — would drag
  every copy of a hot line into a single task, which is exactly the
  degenerate-corpus trap the dedup/df caps elsewhere guard against);
- reassembly via ``groupBy(doc)`` + per-row ``array_sort`` on (pos,
  line) structs — per-document state only, never corpus-wide.

Two shuffles total, both keyed aggregations with combine. Line hashing
uses xxhash64 (JVM, codegen); the df decision never touches Python.

Line semantics match operators/text.py:repetition_features: newline
split, empty lines ignored (they carry no boilerplate signal and are
preserved verbatim in reassembly order gaps — i.e. dropped, matching
CCNet, which re-joins surviving lines with a single separator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_df(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(line_hash, df) — document frequency of every distinct non-empty
    line, counting each line once per document (a footer pasted 50x in
    ONE page is repetition, not cross-document boilerplate — that signal
    belongs to repetition_features)."""
    # per-row array_distinct makes the once-per-document semantics; no id
    # column is needed after it (id_col kept for signature symmetry)
    lines = docs.select(
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), r"\n"), lambda x: F.length(x) > 0)
            )
        ).alias("line"),
    )
    return (
        lines.select(F.xxhash64("line").alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count("*").cast("long").alias("df"))
    )


def remove_duplicated_lines(
    docs: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents with boilerplate lines stripped: every non-empty line
    that appears in >= ``min_df`` distinct documents is removed from ALL
    of them (CCNet semantics — the first copy is just as much
    boilerplate as the last). Returns the input columns with ``text``
    rewritten (surviving lines joined by a single newline; empty lines
    dropped) plus ``n_lines_kept`` / ``n_lines_removed`` longs.

    Documents whose every line is boilerplate come back with empty text
    and n_lines_kept = 0 — the caller decides whether to drop them (a
    quality_score pass after this does it naturally).
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would remove every line)")
    other_cols = [c for c in docs.columns if c != text_col]
    exploded = docs.select(
        *other_cols,
        F.posexplode_outer(
            F.filter(F.split(F.col(text_col), r"\n"), lambda x: F.length(x) > 0)
        ).alias("_pos", "_line"),
    )
    dup = line_df(docs, text_col, id_col).where(F.col("df") >= min_df)
    marked = exploded.join(
        dup.select(F.col("line_hash").alias("_lh")),
        F.xxhash64("_line") == F.col("_lh"),
        "left",
    )
    # posexplode_outer keeps all-empty docs as a (_pos NULL) row so they
    # survive the groupBy with zero kept lines
    per_line = marked.select(
        *other_cols,
        "_pos",
        F.when(F.col("_lh").isNull() & F.col("_pos").isNotNull(), F.col("_line")).alias(
            "_keep_line"
        ),
        F.when(F.col("_lh").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("_rm"),
    )
    # a removed (or NULL-pos) row contributes a NULL struct, which
    # collect_list skips — _kept holds surviving lines only
    kept_struct = F.when(
        F.col("_keep_line").isNotNull(),
        F.struct(F.col("_pos"), F.col("_keep_line").alias("l")),
    )
    return (
        per_line.groupBy(*other_cols)
        .agg(
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
            F.sum("_rm").cast("long").alias("n_lines_removed"),
        )
        .select(
            *other_cols,
            F.array_join(
                F.transform(F.col("_kept"), lambda s: s["l"]), "\n"
            ).alias(text_col),
            F.size("_kept").cast("long").alias("n_lines_kept"),
            "n_lines_removed",
        )
    )


def frequent_lines(
    docs: DataFrame, k: int = 20, min_df: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(line, df) — the top-``k`` most-duplicated lines with their
    document frequency, the human-inspection report that decides the
    ``min_df`` threshold (and catches a template rollout early). Keeps
    line TEXT, so it re-explodes and joins the df table; bounded output
    (k rows) via a single orderBy/limit the optimizer turns into a
    TakeOrdered — no global sort materialization."""
    lines = docs.select(
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), r"\n"), lambda x: F.length(x) > 0)
            )
        ).alias("line")
    )
    return (
        lines.groupBy("line")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), "line")
        .limit(k)
    )
