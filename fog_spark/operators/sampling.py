"""Deterministic neighbor sampling (GraphSAGE-style fan-out capping).

A GNN / embedding training pipeline over a web graph does not consume
full adjacency — it samples a bounded fan-out per vertex (GraphSAGE,
Hamilton et al. 2017). As everywhere in this engine the sample is a pure
hash function of the edge, never RNG state: keep edge (src, dst) iff its
rank under (H(src, dst), dst) within src's distinct out-neighbors is
<= k. Reproducible across partitionings/retries and bit-identical in a
SQL oracle (md5 family); xxhash64 is the production fast path.

Scale note: the rank is one window sort per src group — the same cost
class as the CSR adjacency build and the walks ranked-edge table (a
hub's group sorts in one task with spill, it does not explode). The
OUTPUT is what downstream iterates on, and it is <= k rows per vertex —
the point of the operator is that hub skew is gone after this cap.

Not in the reference (graph-algorithms roadmap only,
/root/reference/TODO.list:16-21); standard published semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fog_spark.graph import normalize_edges


def _edge_hash(hash_fn: str):
    if hash_fn == "xxhash64":
        return F.xxhash64(F.col("src"), F.col("dst"))
    if hash_fn == "md5":
        s = F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string"))
        return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def sample_neighbors(
    edges: DataFrame, k: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """``(src, dst)`` — up to ``k`` deterministically sampled DISTINCT
    out-neighbors per vertex: the k smallest (H(src, dst), dst)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = normalize_edges(edges).select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy(_edge_hash(hash_fn), "dst")
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("src", "dst")
    )
