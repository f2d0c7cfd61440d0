#!/usr/bin/env python
"""Pure-shuffle microbenchmark: how much does THIS BOX's exchange path
gain from more threads, independent of the engine?

Shuffles a fixed synthetic dataset (hash repartition + hash aggregate —
no joins, no Python, no caching) at several local[] levels in fresh
JVMs and reports rows/sec per level. The engine's scatter-gather loop
can never scale better than this path on the same box: if this probe
gains only ~1.7x from 8->32 threads, an 8->32 engine efficiency of
~0.43 is the hardware ceiling, not engine serialization.

Usage: python tools/bandwidth_probe.py [--rows 50000000] [--levels 8,32]
       python tools/bandwidth_probe.py --child --cpus 8 --rows N   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from fog_spark.session import get_spark

    spark = get_spark(app_name=f"bw-probe-{cpus}", cores=cpus, shuffle_partitions=64)
    df = spark.range(0, rows, 1, 64).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("k"),
        F.col("id").alias("v"),
    )
    # warmup (codegen/JIT), then 3 measured shuffles
    df.groupBy("k").agg(F.sum("v")).count()
    walls = []
    for _ in range(3):
        t0 = time.monotonic()
        df.groupBy("k").agg(F.sum("v")).count()
        walls.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"cpus": cpus, "rows": rows, "walls_s": walls}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    if args.child:
        child(args.cpus, args.rows)
        return
    levels = [int(x) for x in args.levels.split(",")]
    out = {}
    for cpus in levels:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--cpus", str(cpus), "--rows", str(args.rows)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        best = min(rec["walls_s"])
        out[cpus] = {"best_wall_s": best, "rows_per_sec": round(args.rows / best)}
    pairs = {
        f"{lo}->{hi}": round(
            (out[hi]["rows_per_sec"] / out[lo]["rows_per_sec"]), 2
        )
        for lo, hi in zip(levels, levels[1:])
    }
    print(json.dumps({
        "metric": "pure_shuffle_speedup",
        "rows": args.rows,
        "levels": {str(k): v for k, v in out.items()},
        "speedup_pairs": pairs,
    }))


if __name__ == "__main__":
    main()
