#!/usr/bin/env python
"""Bytes-on-the-wire audit for the scatter-gather iteration loop.

The north-rule scaling pair (local[8] -> local[32]) is bounded by this
box's memory bandwidth (BENCH/BASELINE.md), so the lever that moves the
ratio is shuffle BYTES, not plan shape: every byte removed from the
exchange path speeds the bandwidth-starved 32-thread level more than
the compute-bound 8-thread level. This tool measures where the bytes
go so tuning is evidence-driven (VERDICT r02 "Next round" #4).

Modes:
  --audit    run FogPageRank on the FIXTURES F2 graph with the Spark UI
             REST API enabled and print per-stage shuffle read/write
             bytes + records, spill, and input bytes, grouped into
             setup vs steady-state iterations. One JSON line at the end.
  --explain  print the formatted plan of one steady-state PageRank and
             one ConnectedComponents iteration, so partial aggregation
             (map-side combine on the explode output) and exchange
             placement can be eyeballed.

Usage: python tools/shuffle_audit.py --audit [--docs 1000000] [--iters 4]
       python tools/shuffle_audit.py --explain
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def stage_metrics(port: int) -> list[dict]:
    (app,) = _rest(port, "applications")
    out = []
    for s in _rest(port, f"applications/{app['id']}/stages?status=complete"):
        out.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "shuffle_write_recs": s["shuffleWriteRecords"],
                "input_mb": round(s["inputBytes"] / 1e6, 1),
                "spill_mb": round(s["memoryBytesSpilled"] / 1e6, 1),
                "wall_ms": s.get("executorRunTime", 0),
            }
        )
    return out


def run_audit(docs: int, iters: int, cores: int, codec: str) -> None:
    from fog_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle-audit",
        cores=cores,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4077",
            "spark.io.compression.codec": codec,
        },
    )
    from fog_spark.algos import FogPageRank
    from fog_spark.plans.engine import ScatterGatherEngine
    from fog_spark.sources.pages import generate_edges

    edges = generate_edges(spark, docs).persist()
    n_edges = edges.count()

    before = {s["stage"] for s in stage_metrics(4077)}
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    res = eng.run(FogPageRank(niters=iters), edges, max_iters=iters)
    res.state.count()

    stages = [s for s in stage_metrics(4077) if s["stage"] not in before]
    total_w = sum(s["shuffle_write_mb"] for s in stages)
    total_r = sum(s["shuffle_read_mb"] for s in stages)
    for s in sorted(stages, key=lambda s: s["stage"]):
        print(
            f"stage {s['stage']:>4}  w={s['shuffle_write_mb']:>8} MB  "
            f"r={s['shuffle_read_mb']:>8} MB  recs={s['shuffle_write_recs']:>10}  "
            f"spill={s['spill_mb']:>6} MB  {s['name']}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "shuffle_bytes_audit",
                "codec": codec,
                "docs": docs,
                "n_edges": n_edges,
                "iters": iters,
                "cores": cores,
                "total_shuffle_write_mb": round(total_w, 1),
                "total_shuffle_read_mb": round(total_r, 1),
                "write_mb_per_iter": round(total_w / iters, 1),
                "bytes_per_edge_per_iter": round(total_w * 1e6 / (n_edges * iters), 2),
                "iter_walls_ms": [h["wall_time_ms"] for h in res.history],
            }
        )
    )


def run_explain() -> None:
    from pyspark.sql import functions as F

    from fog_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cores=8, shuffle_partitions=16)
    from fog_spark.algos import ConnectedComponents, FogPageRank
    from fog_spark.plans.engine import ScatterGatherEngine, scatter_join
    from fog_spark.sources.pages import generate_edges

    edges = generate_edges(spark, 20_000)
    for algo_cls, title in ((FogPageRank, "PageRank"), (ConnectedComponents, "CC")):
        algo = algo_cls()
        eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
        # reproduce exactly one engine iteration's plan
        adj, hub_salts = eng._prepare_adjacency(algo, edges)
        state = eng.mat.checkpoint(
            algo.init_state(edges.select(F.col("src").alias("id")).distinct(), adj)
        )
        active = state.where(F.col("_active")) if algo.uses_frontier else state
        active = eng._expand_salts(active, hub_salts)
        msgs = algo.messages(active, adj)
        new_state = algo.apply(state, algo.gather(msgs).drop("_n_msgs"))
        print(f"\n===== one {title} iteration =====")
        new_state.explain("formatted")
        adj.unpersist()
        eng.mat.free(state)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audit", action="store_true")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--codec", default="lz4")
    args = ap.parse_args()
    if args.explain:
        run_explain()
    if args.audit:
        run_audit(args.docs, args.iters, args.cores, args.codec)


if __name__ == "__main__":
    main()
