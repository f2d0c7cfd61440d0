"""Plain-text SNAP-style edge-list / adjacency-list ingest.

The reference's actual input path is text: ``process_edgelist.cpp``
parses whitespace-separated ``src dst`` lines with ``#`` comments
(/root/reference/convert/process_edgelist.cpp:55-221, read_one_edge in
convert.cpp), and ``process_adjlist.cpp`` parses
``src n_edges dst1 ... dstn`` lines (/root/reference/convert/
process_adjlist.cpp:81-140). README.txt:41-58 converts e.g.
``twitter_rv.net`` this way. These readers are the Spark analog: one
``spark.read.text`` scan plus pure Column expressions (split / slice /
explode — whole-stage codegen, no Python in the row path), so ingest
parallelism is the number of file splits, exactly like any other text
source at 100 TB.

Differences from the reference, by design:
- vertex ids are not required to be 0-based or src-sorted (the C++
  converter aborts on disorder, process_edgelist.cpp:120-128, because
  its on-disk CSR needs sequential offsets); a DataFrame engine has no
  such constraint — ``graph.build_adjacency`` re-sorts by shuffle.
- the reference attaches time-seeded random float weights
  (process_adjlist.cpp:25-30); :func:`with_hash_weights` is the
  deterministic replacement (same formula as FIXTURES F2), so runs are
  reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fog_spark.hashing import pmod

_WS = r"\s+"


def _lines(spark: SparkSession, path: str, comment: str) -> DataFrame:
    raw = spark.read.text(path).select(F.trim("value").alias("line"))
    return raw.where(
        (F.length("line") > 0) & ~F.col("line").startswith(comment)
    )


def read_edgelist(
    spark: SparkSession,
    path: str,
    weighted: bool = False,
    comment: str = "#",
) -> DataFrame:
    """(src:long, dst:long[, weight:double]) from ``src dst[ weight]``
    lines. Any whitespace separates tokens; ``comment``-prefixed and
    blank lines are skipped (process_edgelist.cpp:108-110 skips ``##``
    headers the same way)."""
    toks = F.split(F.col("line"), _WS)
    cols = [
        F.element_at(toks, 1).cast("long").alias("src"),
        F.element_at(toks, 2).cast("long").alias("dst"),
    ]
    if weighted:
        cols.append(F.element_at(toks, 3).cast("double").alias("weight"))
    return _lines(spark, path, comment).select(*cols)


def read_adjlist(
    spark: SparkSession,
    path: str,
    comment: str = "#",
) -> DataFrame:
    """(src:long, dst:long) from ``src n_edges dst1 ... dstn`` lines
    (the reference format, process_adjlist.cpp:81-140). Lines with
    ``n_edges == 0`` yield no rows — matching the converter, which
    skips min/max-id tracking for them too (process_adjlist.cpp:96-101).
    One explode per line; a hub line becomes one task's rows and is
    re-chunked downstream by ``build_adjacency``'s hub salting."""
    toks = F.split(F.col("line"), _WS)
    n = F.element_at(toks, 2).cast("int")
    return (
        _lines(spark, path, comment)
        .select(
            F.element_at(toks, 1).cast("long").alias("src"),
            F.slice(toks, F.lit(3), n).alias("_dsts"),
        )
        .select("src", F.explode("_dsts").alias("_d"))
        .select("src", F.col("_d").cast("long").alias("dst"))
    )


def with_hash_weights(edges: DataFrame) -> DataFrame:
    """Attach the deterministic weight ``1.0 + xxhash64(src, dst) %
    9000 / 1000`` in [1, 10) — the reproducible stand-in for the
    reference's ``10.0 * rand()`` type-1 weights
    (process_adjlist.cpp:25-30); same formula as FIXTURES F2."""
    w = (
        1.0
        + pmod(
            F.xxhash64(F.col("src").cast("long"), F.col("dst").cast("long")),
            F.lit(9000),
        )
        / 1000.0
    )
    return edges.select("src", "dst", w.alias("weight"))


def write_edgelist(edges: DataFrame, path: str, partitions: int | None = None) -> None:
    """Persist ``(src, dst[, weight])`` as whitespace text — the inverse
    of :func:`read_edgelist`, used for roundtrip parity tests and for
    exporting to tools that eat SNAP files. src-sorted within files like
    the converter's output (process_edgelist.cpp:118-126)."""
    cols = [F.col("src").cast("string"), F.col("dst").cast("string")]
    if "weight" in edges.columns:
        cols.append(F.format_number(F.col("weight"), 6))
    out = edges.select(F.concat_ws(" ", *cols).alias("value"))
    if partitions:
        out = out.repartitionByRange(partitions, "value")
    out.sortWithinPartitions("value").write.mode("overwrite").text(path)


def write_adjlist(edges: DataFrame, path: str, partitions: int | None = None) -> None:
    """Persist as ``src n_edges dst1 ... dstn`` lines (one per src),
    dsts ascending — the reference adjlist format."""
    grouped = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("dsts"))
        .select(
            F.concat_ws(
                " ",
                F.col("src").cast("string"),
                F.size("dsts").cast("string"),
                F.array_join(F.transform("dsts", lambda d: d.cast("string")), " "),
            ).alias("value")
        )
    )
    if partitions:
        grouped = grouped.repartitionByRange(partitions, "value")
    grouped.sortWithinPartitions("value").write.mode("overwrite").text(path)
