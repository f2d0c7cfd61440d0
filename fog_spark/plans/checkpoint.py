"""Durable per-iteration checkpoints + lineage table.

North_rule: every iteration's vertex state is snapshotted with
per-partition lineage rows ``(run_id, algorithm, iteration, partition_id,
edge_count, message_count, wall_time_ms)`` so any run resumes
mid-algorithm. The reference's analog is the per-iteration attr write-back
(/root/reference/fogsrc/fog_engine.cpp:246-262, 1120-1144) plus its
utilization/CV logs (fog_engine.cpp:1969-2027) — but FOG cannot resume;
a crash restarts the algorithm.

Storage is parquet-directory-per-iteration with a ``_meta.json`` commit
marker written only after the parquet write succeeds (write-then-commit,
same recovery discipline as an Iceberg snapshot commit).

Why not Iceberg *here*: this container ships no iceberg-spark-runtime jar
(see ``iceberg_available``) and has no network/package installs, so an
Iceberg writer could not even be smoke-tested — shipping one untested
would be worse than the documented fallback. On a cluster the swap is
local to this file: create the two tables from ``ICEBERG_STATE_DDL`` /
``ICEBERG_LINEAGE_DDL`` and replace the parquet writes with
``writeTo(...).append()`` — the commit marker disappears because Iceberg
snapshot commits are already atomic, and ``latest_complete`` becomes a
``MAX(iteration)`` over committed snapshots.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "run_id string, algorithm string, iteration int, partition_id int, "
    "edge_count long, message_count long, wall_time_ms long"
)

# Cluster DDL (SURVEY §1.4): the exact tables this store maps onto when an
# Iceberg catalog is configured. State rows append per (run_id, iteration)
# snapshot; resume reads the latest committed snapshot's max iteration.
ICEBERG_STATE_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.fog.checkpoint_state (
  run_id string, algorithm string, iteration int,
  id bigint, state_json string
) USING iceberg PARTITIONED BY (run_id, bucket(64, id))"""
ICEBERG_LINEAGE_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.fog.lineage (
  run_id string, algorithm string, iteration int, partition_id int,
  edge_count bigint, message_count bigint, wall_time_ms bigint
) USING iceberg PARTITIONED BY (run_id)"""


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND its runtime classes
    load in this JVM. This sandbox has neither (no iceberg-spark-runtime
    jar, no network to fetch one), so the store below is the documented
    parquet + commit-marker fallback."""
    confs = spark.sparkContext.getConf().getAll()
    has_catalog = any(
        k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
        for k, v in confs
    )
    if not has_catalog:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ state
    def _iter_dir(self, run_id: str, algorithm: str, iteration: int) -> str:
        return os.path.join(self.root, run_id, algorithm, f"iter={iteration:05d}")

    def write_state(
        self, run_id: str, algorithm: str, iteration: int, state: DataFrame, meta: dict[str, Any]
    ) -> DataFrame:
        """Write state parquet, then the commit marker; return re-read df
        (fresh lineage — the plan no longer grows with iteration count)."""
        d = self._iter_dir(run_id, algorithm, iteration)
        state.write.mode("overwrite").parquet(d)
        with open(os.path.join(d, "_meta.json"), "w") as f:
            json.dump({"iteration": iteration, **meta}, f)
        return self.spark.read.parquet(d)

    def read_state(self, run_id: str, algorithm: str, iteration: int) -> DataFrame:
        return self.spark.read.parquet(self._iter_dir(run_id, algorithm, iteration))

    def read_meta(self, run_id: str, algorithm: str, iteration: int) -> dict[str, Any]:
        with open(os.path.join(self._iter_dir(run_id, algorithm, iteration), "_meta.json")) as f:
            return json.load(f)

    def latest_complete(self, run_id: str, algorithm: str) -> int | None:
        """Highest iteration with a commit marker — the resume point."""
        d = os.path.join(self.root, run_id, algorithm)
        if not os.path.isdir(d):
            return None
        best = None
        for name in os.listdir(d):
            m = re.fullmatch(r"iter=(\d+)", name)
            if m and os.path.exists(os.path.join(d, name, "_meta.json")):
                it = int(m.group(1))
                best = it if best is None else max(best, it)
        return best

    # ---------------------------------------------------------- lineage
    def append_lineage(self, rows: list[tuple]) -> None:
        """rows: (run_id, algorithm, iteration, partition_id, edge_count,
        message_count, wall_time_ms)."""
        if not rows:
            return
        df = self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(os.path.join(self.root, "_lineage"))

    def read_lineage(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(
            os.path.join(self.root, "_lineage")
        )
