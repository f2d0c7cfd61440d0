"""Loaders for the driver's testdata parquet tables and derived edge tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fog_spark.hashing import pmod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def edges_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic edge table over testdata (FIXTURES.md F5):
    src=o_custkey, dst=o_orderkey % 151. The weight uses plain integer
    arithmetic (not xxhash64) so the exact same expression runs in DuckDB —
    this is the oracle graph for the driver's correctness gate."""
    orders = load_table(spark, sf_dir, "orders")
    src = F.col("o_custkey").cast("long")
    dst = pmod(F.col("o_orderkey").cast("long"), F.lit(151))
    w = 1.0 + pmod(F.col("o_orderkey") * 7 + F.col("o_custkey") * 13, F.lit(9000)) / 1000.0
    return orders.select(src.alias("src"), dst.alias("dst"), w.alias("weight"))


# the same table in ANSI SQL for DuckDB oracles (kept in lockstep with above)
EDGES_SQL = (
    "SELECT CAST(o_custkey AS BIGINT) AS src, "
    "CAST(o_orderkey % 151 AS BIGINT) AS dst, "
    "1.0 + ((o_orderkey * 7 + o_custkey * 13) % 9000) / 1000.0 AS weight "
    "FROM orders"
)
