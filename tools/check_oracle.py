#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND the
matching oracle_sql() on DuckDB over the same parquet tables, then
compares row count, column names, and a value hash (columns sorted by
name, rows sorted by all columns, values canonicalized).

Usage: python tools/check_oracle.py [--only q1,q2] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    # Spark's shuffle files + DuckDB parquet readers share one process
    # here (the real driver separates them); raise the fd ceiling.
    import resource

    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    resource.setrlimit(resource.RLIMIT_NOFILE, (hard, hard))

    import duckdb

    import __spark_entry__ as entry
    from fog_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:24s} spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name:24s} rows={len(srows)} (no oracle, rows-only) "
                  f"[{time.monotonic()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:24s} duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        sh, oh = frame_hash(scols, srows), frame_hash(ocols, orows)
        if sh != oh:
            problems.append(f"hash spark={sh} oracle={oh}")
        if problems:
            print(f"FAIL  {name:24s} {'; '.join(problems)} [{time.monotonic()-t0:.1f}s]")
            if len(srows) == len(orows) and sorted(scols) == sorted(ocols):
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("\x01".join(canon(r[i]) for i in order) for r in srows)
                oord = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted("\x01".join(canon(r[i]) for i in oord) for r in orows)
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diffs:
                    print(f"        spark : {a[:160]}")
                    print(f"        oracle: {b[:160]}")
            n_fail += 1
        else:
            print(f"PASS  {name:24s} rows={len(srows)} hash={sh} "
                  f"[{time.monotonic()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
