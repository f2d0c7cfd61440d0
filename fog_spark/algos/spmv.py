"""SpMV: y = A^T x in one shuffle (reference:
/root/reference/application/spmv.hpp:21-108 — GLOBAL engine, exactly one
iteration: scatter x(u)*w(u,v), gather sum at v). No engine loop needed;
this is the degenerate single-iteration case and a good plan-sanity probe:
scan -> join -> project -> partial agg -> exchange -> final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.graph import normalize_edges


def spmv(edges: DataFrame, x: DataFrame | None = None) -> DataFrame:
    """edges (src,dst,weight) x (id, x) -> (id, y). Default x = 1.0
    (spmv.hpp:41-45), so y(v) = sum of in-edge weights."""
    e = normalize_edges(edges)
    if x is None:
        prod = e.select("dst", F.col("weight").alias("xv"))
    else:
        prod = e.join(x, e["src"] == x["id"]).select(
            "dst", (F.col("weight") * F.col("x")).alias("xv")
        )
    return prod.groupBy(F.col("dst").alias("id")).agg(F.sum("xv").alias("y"))
