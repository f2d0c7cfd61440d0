"""Iteration-state materialization with real block reclamation.

Iterative algorithms materialize per-iteration state via eager
``localCheckpoint`` (truncates the logical plan so analysis stays O(1)
per iteration). The trap: ``DataFrame.unpersist()`` is a **no-op** for a
checkpoint-backed frame — it only clears CacheManager entries, and a
localCheckpoint registers none; the cached RDD blocks survive. Leaked
state copies (one per iteration) then crowd the unified memory pool,
execution demand evicts them *and* the persisted adjacency, and evicted
partitions silently recompute inside consumer stages — measured 5x
throughput loss by iteration ~5 at 14M edges / 32 threads.

``Materializer`` frees blocks at the RDD level instead: it diffs
``SparkContext.getPersistentRDDs()`` around each checkpoint call, tags
the returned DataFrame with the RDD ids it owns, and ``free`` unpersists
exactly those ids. This is the double-buffered attr-segment discipline of
the reference engine (one live buffer + one being written,
/root/reference/headers/config.hpp:200-244) applied to Spark's block
manager.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_TAG = "_fog_owned_rdd_ids"

# serialized MEMORY_AND_DISK: localCheckpoint's default stores
# deserialized row objects at ~3.7x the UnsafeRow footprint (measured
# 367MB for a 1M-row 3-column state) — serialized keeps iteration state
# compact so two state copies + the adjacency fit the storage pool at
# 10^7-vertex scale without evicting
_SER = StorageLevel(True, True, False, False, 1)


class Materializer:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def _pids(self) -> set[int]:
        return set(self.spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    def checkpoint(self, df: DataFrame) -> DataFrame:
        """Eagerly materialize ``df``; the result knows which cached RDDs
        it owns so :meth:`free` can reclaim them.

        Ownership is the EXACT RDD id behind the checkpoint's LogicalRDD,
        not a before/after diff of getPersistentRDDs(): the checkpoint job
        may lazily materialize an unrelated SQL cache as a side effect
        (e.g. the engine's persisted adjacency on its first scan), and a
        diff would tag that cache as owned — freeing this state frame
        would then silently unpersist the adjacency, forcing every later
        iteration to recompute it from shuffle files (measured: +31 MB
        shuffle read and a full collect_list rebuild per iteration)."""
        before = self._pids()
        out = df.localCheckpoint(eager=True, storageLevel=_SER)
        out = self._strip_inherited_stats(out)
        try:
            owned = {int(out._jdf.queryExecution().analyzed().rdd().id())}
        except Exception:  # pragma: no cover - py4j surface drift
            owned = self._pids() - before
        object.__setattr__(out, _TAG, owned)
        return out

    def _strip_inherited_stats(self, out: DataFrame) -> DataFrame:
        """Drop the origin plan's Statistics/constraints from the
        checkpoint's LogicalRDD.

        ``Dataset.localCheckpoint`` copies the ORIGIN plan's estimated
        statistics into the new LogicalRDD. Spark's size-only estimator
        MULTIPLIES ``sizeInBytes`` at every join, so an iterative loop
        whose per-iteration plan joins the state with itself (pointer
        doubling, apply joins) SQUARES the inherited estimate each
        iteration — the BigInt reaches millions of digits within ~10
        iterations and the driver then spends its time in
        BigInteger.multiply inside join-size estimation (measured: SCC's
        backward fixpoint at 2k vertices went 0.7 s -> 177 s per
        iteration from this alone; sizeInBytes hit 2*10^7 digits).
        Rebuilding the LogicalRDD with empty originStats resets the
        estimate to the (finite) default each iteration — the estimator
        then multiplies a handful of 63-bit numbers per plan instead of
        compounding across iterations. Join-strategy impact: none for
        the engine (auto-broadcast is disabled inside iteration loops)
        and none for hand loops (the inherited estimate was
        astronomically large, so nothing auto-broadcast before either).
        Best-effort: any py4j surface drift falls back to the
        stats-inheriting frame, which is correct but slow.

        ``FOG_SPARK_KEEP_INHERITED_STATS=1`` disables the strip (A/B
        diagnosis hatch)."""
        if os.environ.get("FOG_SPARK_KEEP_INHERITED_STATS") == "1":
            return out
        try:
            jvm = self.spark._jvm
            lr = out._jdf.queryExecution().analyzed()
            if lr.getClass().getName() != "org.apache.spark.sql.execution.LogicalRDD":
                return out
            new_lr = jvm.org.apache.spark.sql.execution.LogicalRDD(
                lr.output(),
                lr.rdd(),
                lr.outputPartitioning(),
                lr.outputOrdering(),
                lr.isStreaming(),
                lr.stream(),
                self.spark._jsparkSession,
                jvm.scala.Option.empty(),
                jvm.scala.Option.empty(),
            )
            ds = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                self.spark._jsparkSession, new_lr
            )
            return DataFrame(ds, out.sparkSession)
        except Exception:  # pragma: no cover - py4j surface drift
            return out

    def free(self, df: DataFrame | None) -> None:
        """Release the cached blocks behind a frame produced by
        :meth:`checkpoint`; no-op for anything else."""
        ids = getattr(df, _TAG, None)
        if not ids:
            return
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            rdd = jmap.get(i)
            if rdd is not None:
                rdd.unpersist(False)
        object.__setattr__(df, _TAG, set())

    def swap(self, old: DataFrame | None, new: DataFrame) -> DataFrame:
        """Checkpoint ``new`` then free ``old`` — double-buffered state."""
        out = self.checkpoint(new)
        if old is not None:
            self.free(old)
        return out

    def adopt(self, view: DataFrame, owner: DataFrame) -> DataFrame:
        """Tag a derived view (e.g. ``owner.drop(col)``) as owning the same
        blocks, so freeing the view frees the materialized owner."""
        object.__setattr__(view, _TAG, getattr(owner, _TAG, set()))
        return view
