"""fog_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimagining of the capabilities of hmlv/fog (a single-node
out-of-core scatter-gather graph engine, see /root/reference) as an idiomatic
Spark DataFrame library:

- ingest: Common-Crawl-style pages -> outlink extraction -> edge table
  (reference analog: the ``convert`` binary, convert/convert.cpp:9-37)
- graph: grouped (CSR-style) adjacency, degrees, symmetrization, salted
  hub splitting (reference analog: .index/.edge files + work stealing,
  fogsrc/index_vert_array.cpp, fog_engine.cpp:819-1011)
- engine: iterative scatter-gather driver with per-iteration checkpoints,
  per-partition lineage rows and resume (reference analog:
  fog_engine::operator()(), fogsrc/fog_engine.cpp:92-244)
- algos: PageRank (FOG's exact recurrence + standard damped), connected
  components (hash-min), label propagation, triangle counting, BFS, SSSP,
  SpMV (reference analogs: application/*.hpp)
- operators: training-data pipeline ops (dedup, similarity search, text
  analysis, multimodal plumbing) — beyond the reference, Spark-first.

Everything is DataFrame/SQL; Python touches data only through Arrow-batched
pandas UDFs, never per-row.
"""

__version__ = "0.1.0"

from fog_spark.session import get_spark  # noqa: F401
