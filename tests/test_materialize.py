"""Materializer block-ownership regression tests.

Pins the round-3 fix: checkpoint ownership is the EXACT RDD id behind
the checkpoint's LogicalRDD, never a before/after diff of
getPersistentRDDs(). The diff approach mis-tagged any unrelated SQL
cache that happened to materialize lazily inside the checkpoint job
(the engine's persisted adjacency on its first scan), so freeing
iteration state silently evicted the adjacency and every later
iteration rebuilt it from shuffle files.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fog_spark.plans.materialize import _TAG, Materializer


def _pids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_checkpoint_owns_exactly_one_rdd(spark):
    m = Materializer(spark)
    st = m.checkpoint(spark.range(0, 100).select(F.col("id")))
    owned = set(getattr(st, _TAG))
    assert len(owned) == 1
    assert owned <= _pids(spark)
    m.free(st)
    assert not (owned & _pids(spark))


def test_free_does_not_evict_bystander_sql_cache(spark):
    """A lazily-persisted frame that first materializes INSIDE the
    checkpoint job must survive freeing the checkpointed state."""
    m = Materializer(spark)
    cached = (
        spark.range(0, 5000)
        .select("id", (F.col("id") % 7).alias("k"))
        .persist()
    )
    try:
        # no action on `cached` yet — its InMemoryRelation RDD registers
        # during the checkpoint job below, exactly the engine's adjacency
        # timing that triggered the original bug
        st = m.checkpoint(cached.groupBy("k").agg(F.count("*").alias("n")))
        owned = set(getattr(st, _TAG))
        bystanders = _pids(spark) - owned
        assert bystanders, "cached frame should have materialized in-job"

        m.free(st)
        after = _pids(spark)
        assert not (owned & after), "checkpoint blocks must be reclaimed"
        assert bystanders <= after, "free() evicted an unrelated cache"
        assert cached.count() == 5000
    finally:
        cached.unpersist()


def test_free_is_noop_for_untagged_frames(spark):
    m = Materializer(spark)
    before = _pids(spark)
    m.free(spark.range(3).select("id"))
    m.free(None)
    assert _pids(spark) == before
