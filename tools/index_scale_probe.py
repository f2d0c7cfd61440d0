#!/usr/bin/env python
"""Retrieval scale probe: inverted-index build + BM25 query throughput
at two (or more) corpus sizes, recording walls and per-doc / per-query
throughput at each.

Same protocol as tools/dedup_scale_probe.py (the committed precedent):
synthetic generate_pages corpus persisted before timing, single trial
per level, whole-box hypervisor steal % recorded per timing so a
polluted trial is visible. Two timings per level:

- build: build_postings + doc_lengths materialized to counts — one
  tokenize/explode scan + two hash aggs (map-side combinable), the
  "build once" half of the query service;
- query: bm25_topk_micro over the PREBUILT index for a fixed 8-query
  batch — broadcast-semi-join postings filter + score agg + salted
  two-phase top-k, the "query many" half. Per-query wall should stay
  roughly flat as the corpus grows because scoring touches only the
  query terms' postings.

Usage: python tools/index_scale_probe.py [--docs 1000000,4000000]
                                         [--out BENCH/index_scale_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# terms from sources/pages.VOCAB (the generate_pages corpus vocabulary)
# so every query matches real postings; "zzz" pins the no-hit path
QUERIES = [
    "alpha bravo charlie",
    "harbor lagoon reef",
    "quartz onyx pearl",
    "delta echo foxtrot golf",
    "summit thicket vale",
    "kilo lima mike november",
    "amber birch cedar",
    "tango zzz-unmatched",
]


def read_steal():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:9]]
    return vals[7], sum(vals)


def steal_between(s0, s1) -> float:
    return round(100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2)


def probe_level(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from fog_spark.operators.index import (
        bm25_topk_micro,
        build_postings,
        doc_lengths,
    )
    from fog_spark.sources.pages import generate_pages

    docs = (
        generate_pages(spark, n_docs)
        .select(
            F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
            "text",
        )
        .persist()
    )
    docs.count()  # materialize before timing

    s0 = read_steal()
    t0 = time.time()
    postings = build_postings(docs).persist()
    lengths = doc_lengths(docs).persist()
    n_postings = postings.count()
    lengths.count()
    build_wall = time.time() - t0
    build_steal = steal_between(s0, read_steal())

    s0 = read_steal()
    t0 = time.time()
    n_hits = bm25_topk_micro(
        docs, QUERIES, k=10, postings=postings, lengths=lengths
    ).count()
    query_wall = time.time() - t0
    query_steal = steal_between(s0, read_steal())

    postings.unpersist()
    lengths.unpersist()
    docs.unpersist()
    return {
        "docs": n_docs,
        "build": {
            "postings_rows": n_postings,
            "wall_sec": round(build_wall, 2),
            "docs_per_sec": int(n_docs / build_wall),
            "steal_pct": build_steal,
        },
        "query": {
            "queries": len(QUERIES),
            "topk_rows": n_hits,
            "wall_sec": round(query_wall, 2),
            "queries_per_sec": round(len(QUERIES) / query_wall, 2),
            "steal_pct": query_steal,
            "params": "k=10, integer-micro scorer, prebuilt persisted index",
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="1000000,4000000")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "index_scale_r4.json"))
    args = ap.parse_args()
    levels = [int(x) for x in args.docs.split(",")]

    from fog_spark.session import get_spark

    spark = get_spark(app_name="index_scale_probe", cores=32, shuffle_partitions=64)
    report = {
        "probe": "index_scale",
        "date": time.strftime("%Y-%m-%d"),
        "cpus": 32,
        "shuffle_partitions": 64,
        "input": "generate_pages(n) synthetic corpus (FIXTURES F1 text), persisted before timing",
        "protocol": (
            "single trial per level, whole-box steal % recorded per timing "
            "(supplementary scale evidence)"
        ),
        "levels": [probe_level(spark, n) for n in levels],
    }
    if len(report["levels"]) >= 2:
        lo, hi = report["levels"][0], report["levels"][-1]
        report["throughput_ratio_big_over_small"] = {
            "build_docs_per_sec": round(
                hi["build"]["docs_per_sec"] / max(1, lo["build"]["docs_per_sec"]), 3
            ),
            "query_wall_big_over_small": round(
                hi["query"]["wall_sec"] / max(1e-9, lo["query"]["wall_sec"]), 3
            ),
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
