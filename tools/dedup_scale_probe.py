#!/usr/bin/env python
"""Corpus-dedup scale probe: near_dup_clusters + line dedup at two (or
more) corpus sizes, recording walls and per-doc throughput at each.

Round 3 published a single 1M-doc datapoint (BENCH/dedup_scale_r3.json)
from an ad-hoc script that never landed in the repo; this tool makes the
probe reproducible AND turns it into a linearity curve: both paths are
groupBy-with-combine + equi-join shapes (no window over a skewable key,
no all-pairs stage), so docs/sec should stay roughly flat as the corpus
grows — the same "same plan, more data" evidence bench.py --scaling-data
records for the iterative engine.

Protocol (matches the r3 record): synthetic generate_pages corpus
(FIXTURES F1 text) persisted before timing, single trial per level (this
is supplementary scale evidence, not the steal-gated headline record —
bench.py's dedup_clusters/line_dedup at sf0.1 is that), whole-box
hypervisor steal %% recorded per timing so a polluted trial is visible.

Usage: python tools/dedup_scale_probe.py [--docs 1000000,4000000]
                                         [--out BENCH/dedup_scale_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_steal():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:9]]
    return vals[7], sum(vals)


def steal_between(s0, s1) -> float:
    return round(100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2)


def probe_level(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from fog_spark.operators.dedup import near_dup_clusters
    from fog_spark.operators.linededup import remove_duplicated_lines
    from fog_spark.sources.pages import generate_pages

    # (doc_id, text): doc_id recovered from the deterministic url tail;
    # two boilerplate lines planted per doc for the line-dedup path
    # (same shape as the r3 record: every doc shares them, so exactly
    # 2 * n_docs line occurrences must be removed corpus-wide).
    docs = (
        generate_pages(spark, n_docs)
        .select(
            F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
            F.concat(
                F.lit("COPYRIGHT site boilerplate line\n"),
                F.col("text"),
                F.lit("\nsubscribe to our newsletter"),
            ).alias("text"),
        )
        .persist()
    )
    docs.count()  # materialize before timing

    s0 = read_steal()
    t0 = time.time()
    n_clusters = (
        near_dup_clusters(spark, docs).agg(
            F.countDistinct("cluster").alias("c")
        ).collect()[0]["c"]
    )
    ndc_wall = time.time() - t0
    ndc_steal = steal_between(s0, read_steal())

    lines_of = lambda c: F.size(  # noqa: E731
        F.filter(F.split(c, r"\n"), lambda x: F.length(x) > 0)
    )
    total_before = docs.agg(F.sum(lines_of(F.col("text")))).collect()[0][0]
    s0 = read_steal()
    t0 = time.time()
    total_after = (
        remove_duplicated_lines(docs)
        .agg(F.sum(lines_of(F.col("text"))))
        .collect()[0][0]
    )
    ld_wall = time.time() - t0
    ld_steal = steal_between(s0, read_steal())
    docs.unpersist()
    return {
        "near_dup_clusters": {
            "docs": n_docs,
            "clusters": n_clusters,
            "wall_sec": round(ndc_wall, 2),
            "docs_per_sec": int(n_docs / ndc_wall),
            "steal_pct": ndc_steal,
            "params": "num_hashes=16, bands=4, xxhash64, no jaccard verify",
        },
        "line_dedup": {
            "docs": n_docs,
            "lines_removed": int(total_before - total_after),
            "wall_sec": round(ld_wall, 2),
            "docs_per_sec": int(n_docs / ld_wall),
            "steal_pct": ld_steal,
            "params": "min_df=2, two planted boilerplate lines per doc",
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="1000000,4000000")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "dedup_scale_r4.json"))
    args = ap.parse_args()
    levels = [int(x) for x in args.docs.split(",")]

    from fog_spark.session import get_spark

    spark = get_spark(app_name="dedup_scale_probe", cores=32, shuffle_partitions=64)
    report = {
        "probe": "corpus_dedup_scale",
        "date": time.strftime("%Y-%m-%d"),
        "cpus": 32,
        "shuffle_partitions": 64,
        "input": "generate_pages(n) synthetic corpus (FIXTURES F1 text), persisted before timing",
        "protocol": (
            "single trial per level, whole-box steal %% recorded per timing "
            "(supplementary scale evidence; headline bench.py queries "
            "dedup_clusters/line_dedup are the steal-gated record at sf0.1)"
        ),
        "levels": [probe_level(spark, n) for n in levels],
    }
    # linearity: docs/sec ratio big/small per op (1.0 = perfectly flat)
    if len(report["levels"]) >= 2:
        lo, hi = report["levels"][0], report["levels"][-1]
        report["throughput_ratio_big_over_small"] = {
            op: round(hi[op]["docs_per_sec"] / lo[op]["docs_per_sec"], 3)
            for op in ("near_dup_clusters", "line_dedup")
        }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["levels"][-1]["near_dup_clusters"]))
    print("written:", args.out)


if __name__ == "__main__":
    main()
