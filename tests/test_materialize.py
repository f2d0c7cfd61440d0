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


def test_checkpoint_resets_inherited_statistics(spark):
    # localCheckpoint inherits the origin plan's estimated Statistics;
    # Spark's size-only estimator MULTIPLIES sizeInBytes at every join,
    # so a loop whose plan self-joins the state squares the inherited
    # estimate per iteration (measured: millions of BigInt digits and
    # 0.7 s -> 177 s driver-side iteration walls by iteration 6 of SCC's
    # backward fixpoint). checkpoint() must reset the estimate each
    # swap so it stays bounded across any number of iterations.
    from pyspark.sql import functions as F

    m = Materializer(spark)

    def size_digits(df):
        return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))

    state = m.checkpoint(
        spark.range(50).select("id", F.col("id").alias("v"))
    )
    for _ in range(4):
        right = state.select(F.col("id").alias("rid"), F.col("v").alias("rv"))
        nxt = state.join(right, state["v"] == F.col("rid")).select(
            "id", F.col("rv").alias("v")
        )
        state = m.swap(state, nxt)
    # bounded: a fresh default-sized estimate squares at most once
    # within a single plan (~40 digits); inheritance would be >150
    # digits after 4 squarings and grow without bound from there
    assert size_digits(state) < 100
    assert state.count() == 50
    m.free(state)
