"""SparkSession factory with scale-aware defaults.

Local mode is the test bed; the config mirrors what we would submit with
``spark-submit --py-files fog_spark.zip`` on a multi-executor cluster —
AQE on (runtime re-plan + skew-join splitting), Arrow on (fast pandas UDF
boundary), explicit shuffle-partition sizing (the analog of FOG's per-CPU
update-strip sizing, /root/reference/headers/config.hpp:175-248).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fog_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local[N] parallelism; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(2*cores, 8) — on a real cluster
    use :func:`shuffle_partitions_for` to size from the edge count.
    master: explicit master URL (or $SPARK_GRAFT_MASTER) — overrides the
    local[cores] derivation; ``cores`` then only sizes the parallelism
    confs. Used by the executor-scaling bench to run the same job on
    ``local-cluster[E,C,M]`` (separate executor JVMs, the in-sandbox
    analog of an N-executor cluster).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is not None:
        ncores = cores if cores is not None else (os.cpu_count() or 8)
    elif cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * ncores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(ncores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("FOG_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # zstd shuffle blocks: 33% fewer bytes on the wire than lz4
        # (measured 18.3 -> 12.2 B/edge/iter on the PageRank loop,
        # tools/shuffle_audit.py). The byte cut wins wherever the
        # exchange path is bandwidth-bound — this box beyond ~8 threads
        # (iteration walls -12% at local[32]) and any real cluster's
        # network — and costs ~25% extra CPU in the compute-bound
        # local[8] regime, the right trade at the 100 TB target.
        .config("spark.io.compression.codec", "zstd")
        # Iterative scatter-gather spends its time in shuffle stages
        # whose inputs (shuffle blocks, cached adjacency partitions)
        # every executor can fetch; the default 3s locality wait makes
        # an executor that drained its local queue sit IDLE for 3s per
        # locality level instead of stealing queued tasks — measured 26%
        # off the steady iteration wall on a 4-executor local-cluster
        # PageRank (median 6.9s -> 5.1s, 14M edges). local[N] is
        # unaffected (one executor = everything process-local). Deploys
        # whose SCAN stages need HDFS locality can override via
        # extra_conf / $SPARK_GRAFT_EXTRA_CONF.
        .config("spark.locality.wait", "0")
    )
    if master.startswith("local-cluster["):
        # local-cluster[E,C,M]: M is each worker's memory budget in MB;
        # the executor JVM it launches must fit inside it (Spark's
        # default 1g would under-use a bigger worker; a bigger default
        # would fail to launch). Leave 512 MB headroom for the worker,
        # but NEVER request more than the worker's whole budget: an
        # executor.memory > M never launches and the job hangs forever
        # at "Initial job has not accepted any resources" (the old
        # max(1024, M-512) did exactly that for M < 1024, and for
        # M == 1024 it silently consumed the entire budget).
        try:
            worker_mb = int(master.rstrip("]").split(",")[2])
            exec_mb = min(worker_mb, max(1024, worker_mb - 512))
            builder = builder.config("spark.executor.memory", f"{exec_mb}m")
        except (IndexError, ValueError):
            pass
    # $SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" — experiment/override hook for
    # subprocess benches where no code path reaches extra_conf
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, env_conf.split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_partitions_for(num_edges: int, rows_per_partition: int = 2_000_000) -> int:
    """Size shuffle partitions from the graph scale.

    The analog of FOG's segment/strip sizing (headers/config.hpp:200-248):
    keep each shuffle partition's message volume bounded so gather state
    fits in executor memory. At 10^12-doc scale (~4e12 edges) with the
    default 2M rows/partition this yields ~2M partitions — cap per cluster
    via the rows_per_partition knob instead.
    """
    return max(8, min(200_000, (num_edges + rows_per_partition - 1) // rows_per_partition))
