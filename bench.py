#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and print
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Graph queries run on the deterministic synthetic web graph (FIXTURES.md
F1/F2; sf0.1 -> 1M docs, ~3.5M edges) — generated in-plan with pure
Column expressions, so generation itself is parallel and measured.
Document/embedding queries run on the sf-dir parquet tables.

Scaling mode (north_rule: throughput scaling efficiency >=0.8 between N
and 4N parallelism; no real cluster in this sandbox, so two local[]
levels stand in): `python bench.py --scaling` spawns two fresh JVMs at
local[8] and local[32] over the SAME input, reports PageRank edges/sec
per iteration at both plus efficiency = (eps_32/eps_8) / (32/8), and
writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
PR_ITERS = 5


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def n_docs_for(sf: float) -> int:
    # FIXTURES.md bench scale: sf0.1 -> 1e6 docs (~3.5M edges)
    return max(1000, int(10_000_000 * sf))


def build_queries(spark, sf_dir: str, n_docs: int):
    """name -> zero-arg callable; each returns a small result dict."""
    from pyspark.sql import functions as F

    from fog_spark.algos import (
        ConnectedComponents,
        FogPageRank,
        LabelPropagation,
        triangles,
    )
    from fog_spark.functions.extract import edges_from_pages
    from fog_spark.operators.dedup import minhash_lsh_candidates
    from fog_spark.operators.similarity import cosine_topk
    from fog_spark.operators.text import quality_features
    from fog_spark.plans.engine import ScatterGatherEngine
    from fog_spark.sources.pages import generate_edges, generate_pages

    edges = generate_edges(spark, n_docs).persist()
    n_edges = edges.count()  # materialize once; all graph queries share it

    def engine():
        return ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)

    def q_extract_edges():
        pages = generate_pages(spark, n_docs)
        n = edges_from_pages(pages, weighted=False).count()
        return {"rows": n}

    def q_pagerank5():
        res = engine().run(FogPageRank(niters=PR_ITERS), edges)
        top = res.state.orderBy(F.col("rank").desc(), "id").limit(5).collect()
        return {"iters": res.iterations, "top1_rank": float(top[0]["rank"])}

    def q_cc():
        res = engine().run(ConnectedComponents(), edges, max_iters=50)
        n = res.state.agg(F.countDistinct("component")).collect()[0][0]
        return {"iters": res.iterations, "components": int(n)}

    def q_lpa4():
        res = engine().run(LabelPropagation(max_iters=4), edges)
        n = res.state.agg(F.countDistinct("label")).collect()[0][0]
        return {"iters": res.iterations, "labels": int(n)}

    def q_triangles():
        n = triangles(edges).count()
        return {"triangles": int(n)}

    def q_dedup_minhash():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = minhash_lsh_candidates(docs, num_hashes=16, bands=4).count()
        return {"candidates": int(n)}

    def q_doc_stats():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        row = quality_features(docs).agg(
            F.count("*").alias("n"), F.avg("quality_score").alias("q")
        ).collect()[0]
        return {"docs": int(row["n"]), "avg_quality": float(row["q"])}

    def q_cosine_topk():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        probes = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        n = cosine_topk(emb, probes, k=10).count()
        return {"rows": int(n)}

    queries = {
        "extract_edges": q_extract_edges,
        "pagerank5": q_pagerank5,
        "cc": q_cc,
        "lpa4": q_lpa4,
        "triangles": q_triangles,
        "dedup_minhash": q_dedup_minhash,
        "doc_stats": q_doc_stats,
        "cosine_topk": q_cosine_topk,
    }
    return queries, edges, n_edges


def run_bench(sf_dir: str, cpus: int, only: list[str] | None = None) -> dict:
    from fog_spark.session import get_spark

    sf = sf_of(sf_dir)
    n_docs = n_docs_for(sf)
    spark = get_spark(app_name=f"fog-spark-bench-{cpus}", cores=cpus)
    t_start = time.monotonic()
    queries, edges, n_edges = build_queries(spark, sf_dir, n_docs)
    timings: dict[str, float] = {}
    details: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        details[name] = fn()
        timings[name] = round(time.monotonic() - t0, 3)
    total = round(time.monotonic() - t_start, 3)
    pr_eps = (
        round(n_edges * PR_ITERS / timings["pagerank5"]) if "pagerank5" in timings else None
    )
    edges.unpersist()
    spark.stop()
    return {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_edges": n_edges,
        "pagerank_edges_per_sec_per_iter": pr_eps,
        "details": details,
    }


def run_scaling(sf_dir: str, levels=(8, 32)) -> dict:
    """Same job (pagerank5 on the same synthetic graph), two parallelism
    levels, each in a fresh JVM so executor-thread count is honest."""
    results = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus),
             "--only", "pagerank5", "--sf-dir", sf_dir],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    lo, hi = levels
    eps_lo = results[lo]["pagerank_edges_per_sec_per_iter"]
    eps_hi = results[hi]["pagerank_edges_per_sec_per_iter"]
    eff = (eps_hi / eps_lo) / (hi / lo)
    report = {
        "metric": "pagerank_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": sf_of(sf_dir),
        "levels": {
            str(c): {
                "edges_per_sec_per_iter": results[c]["pagerank_edges_per_sec_per_iter"],
                "pagerank5_sec": results[c]["queries"]["pagerank5"],
            }
            for c in levels
        },
        "n_edges": results[hi]["n_edges"],
    }
    _write_baseline_md(report, levels)
    return report


def _write_baseline_md(report: dict, levels) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lo, hi = levels
    llo, lhi = report["levels"][str(lo)], report["levels"][str(hi)]
    md = f"""# BENCH/BASELINE — measured scaling evidence

North rule: >=0.8 throughput scaling efficiency between N and 4N
parallelism. No real cluster in this sandbox, so the same PageRank job
runs on the same input at two local[] levels in fresh JVMs
(BASELINE.md: efficiency = (eps_4N / eps_N) / 4).

| level | PageRank {PR_ITERS} iters (sec) | edges/sec/iteration |
|---|---|---|
| local[{lo}] | {llo['pagerank5_sec']} | {llo['edges_per_sec_per_iter']:,} |
| local[{hi}] | {lhi['pagerank5_sec']} | {lhi['edges_per_sec_per_iter']:,} |

- input: synthetic web graph (FIXTURES.md F2), sf={report['sf']}, {report['n_edges']:,} edges
- **scaling efficiency ({lo}->{hi} cores): {report['value']}**
- generated by `python bench.py --scaling`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--only", action="append", help="run only these queries")
    ap.add_argument("--scaling", action="store_true", help="two-level scaling run")
    args = ap.parse_args()
    if args.scaling:
        report = run_scaling(args.sf_dir)
    else:
        report = run_bench(args.sf_dir, args.cpus, args.only)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
