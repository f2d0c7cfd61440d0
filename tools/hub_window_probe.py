"""Quantify the round-5 window-over-vertex-key fixes on a planted hub.

Three plan families lost their single-task hub sort in round 5 (VERDICT
r04 finding #2). This probe measures each NEW path against an inline
replica of its ROUND-4 shape on the same planted-hub input — the same
one-off old-vs-new protocol as BENCH/triangle_delta_cache_r5.json:

- ranked-edge build: graph.ranked_out_edges (range-chunked two-phase)
  vs `row_number() over (partition by src order by dst)`;
- sample_neighbors: the salted two-phase top-k vs one window over src;
- coreness h-index round: the (dst, est) histogram vs a row_number
  window over every edge message.

Input: one ``hub_deg``-out-degree hub plus a uniform background graph,
all ids long. Each variant runs in the SAME session back to back (the
input frames are persisted first, so both variants read identical
cached bytes); /proc/stat steal is recorded per measurement. Usage:

    python tools/hub_window_probe.py [hub_deg] [background_edges]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def steal():
    parts = open("/proc/stat").readline().split()
    return int(parts[8]), sum(int(x) for x in parts[1:])


def timed(fn):
    s0 = steal()
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 2)
    s1 = steal()
    pct = round(100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2)
    return wall, pct, out


def main() -> None:
    hub_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    bg = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fog_spark import graph as G
    from fog_spark.hashing import pmod
    from fog_spark.operators.sampling import sample_neighbors
    from fog_spark.session import get_spark

    spark = get_spark(app_name="hub-window-probe")
    hub = spark.range(hub_deg).select(
        F.lit(7).cast("long").alias("src"),
        (F.col("id") * 2_654_435_761 % (1 << 40)).alias("dst"),
    )
    back = spark.range(bg).select(
        pmod(F.xxhash64("id", F.lit(1)), 1_000_000).alias("src"),
        pmod(F.xxhash64("id", F.lit(2)), 1_000_000).alias("dst"),
    )
    e = hub.unionByName(back).persist()
    n_edges = e.count()
    report: dict = {"hub_deg": hub_deg, "n_edges": n_edges, "cases": {}}

    # ---- 1. ranked-edge build — sum(idx) forces the rank computation
    # (a bare count() lets ColumnPruning delete the window entirely and
    # measures nothing)
    def new_ranked():
        return int(
            G.ranked_out_edges(e, hub_threshold=100_000)
            .agg(F.sum("idx")).collect()[0][0]
        )

    def old_ranked():
        w = Window.partitionBy("src").orderBy("dst")
        return int(
            G.normalize_edges(e)
            .select((F.row_number().over(w) - 1).cast("long").alias("idx"))
            .agg(F.sum("idx")).collect()[0][0]
        )

    for name, fn in (("new_chunked", new_ranked), ("old_window", old_ranked)):
        wall, pct, rows = timed(fn)
        report["cases"].setdefault("ranked_build", {})[name] = {
            "wall_s": wall, "steal_pct": pct, "rows": rows,
        }

    # ---- 2. neighbor sampling (k = 16) — both arms read the same
    # persisted distinct edge set so the diff isolates the cap itself
    ed = G.normalize_edges(e).select("src", "dst").distinct().persist()
    ed.count()

    def new_sample():
        return sample_neighbors(ed, k=16).count()

    def old_sample():
        # same .distinct() the operator itself pays, for arm parity
        h = F.xxhash64(F.col("src"), F.col("dst"))
        w = Window.partitionBy("src").orderBy(h, "dst")
        return (
            ed.distinct().withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 16)
            .count()
        )

    for name, fn in (("new_salted", new_sample), ("old_window", old_sample)):
        wall, pct, rows = timed(fn)
        report["cases"].setdefault("sample_neighbors", {})[name] = {
            "wall_s": wall, "steal_pct": pct, "rows": rows,
        }

    # ---- 3. one coreness h-index round over the symmetrized graph.
    # msgs is PERSISTED so the shared state-join cost drops out and the
    # arms isolate the h-index aggregation itself.
    sym = G.symmetrize(e)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("core"))
    est = deg.persist()
    est.count()
    msgs = sym.join(est, sym["src"] == est["id"]).select(
        "dst", F.col("core").alias("nc")
    ).persist()
    msgs.count()

    def new_hidx():
        w = (
            Window.partitionBy("dst")
            .orderBy(F.col("nc").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        hist = msgs.groupBy("dst", "nc").agg(F.count("*").alias("_c"))
        return (
            hist.withColumn("_cum", F.sum("_c").over(w))
            .groupBy("dst")
            .agg(F.max(F.least(F.col("nc"), F.col("_cum"))).alias("h"))
            .count()
        )

    def old_hidx():
        w = Window.partitionBy("dst").orderBy(F.col("nc").desc())
        return (
            msgs.withColumn("rn", F.row_number().over(w))
            .groupBy("dst")
            .agg(F.max(F.least(F.col("nc"), F.col("rn"))).alias("h"))
            .count()
        )

    for name, fn in (("new_histogram", new_hidx), ("old_window", old_hidx)):
        wall, pct, rows = timed(fn)
        report["cases"].setdefault("coreness_round", {})[name] = {
            "wall_s": wall, "steal_pct": pct, "rows": rows,
        }

    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
