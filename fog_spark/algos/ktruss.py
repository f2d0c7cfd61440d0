"""k-truss: iterative triangle-support peel over the simple graph.

The k-truss (Cohen 2008) is the maximal subgraph in which every edge
participates in >= k-2 triangles *within the subgraph* — a stronger,
edge-centric cousin of the k-core, standard in cohesive-subgraph mining.
Not in the reference (its roadmap stops at SCC/MSF,
/root/reference/TODO.list:16-21); standard published semantics.

Peel loop, each round:
1. enumerate triangles of the surviving canonical edge set with the same
   degree-ordered orientation as ``algos.triangles`` (oriented out-degree
   O(sqrt m) bounds hub wedges);
2. per-edge support = triangle rows exploded to their 3 edges, one
   map-side-combinable groupBy;
3. semi-join the edge set down to support >= k-2.

Rounds are BOUNDED (``max_rounds``), the bound is part of the query
contract (the oracle unrolls the same rounds), and the loop exits early
at fixpoint or an empty edge set. Each round shrinks the edge set
monotonically; at 100 TB the first triangle enumeration dominates —
same cost class as one triangle count, the peel tail is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.algos.triangles import _canonical_undirected, triangles_of_canonical
from fog_spark.plans.materialize import Materializer


def k_truss(edges: DataFrame, k: int, max_rounds: int = 8) -> DataFrame:
    """``(a, b)`` — edges of the k-truss after at most ``max_rounds``
    peel rounds (fixpoint usually hits earlier; the bound makes the
    result a deterministic function of (graph, k, max_rounds))."""
    if k < 3:
        raise ValueError("k must be >= 3 (the 2-truss is the whole graph)")
    M = Materializer(edges.sparkSession)
    und = M.checkpoint(_canonical_undirected(edges))
    n_prev = und.count()
    for _ in range(max_rounds):
        if n_prev == 0:
            break
        tri = triangles_of_canonical(und)
        supp = (
            tri.select(F.col("a"), F.col("b"))
            .unionByName(tri.select("a", F.col("c").alias("b")))
            .unionByName(tri.select(F.col("b").alias("a"), F.col("c").alias("b")))
            .groupBy("a", "b")
            .agg(F.count("*").alias("_supp"))
            .where(F.col("_supp") >= k - 2)
            .select("a", "b")
        )
        und = M.swap(und, und.join(supp, ["a", "b"], "left_semi"))
        n_now = und.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return und
