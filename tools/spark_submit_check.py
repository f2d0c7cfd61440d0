#!/usr/bin/env python
"""End-to-end ``spark-submit --py-files`` deployment check.

Proves the north rule's deployment claim with a real spark-submit:

1. zip the ``fog_spark`` package (the artifact a cluster submit ships);
2. synthesize a small deterministic edge parquet with pyarrow (no Spark
   on the orchestrator side);
3. run ``spark-submit --master <master> --py-files fog_spark.zip
   tools/submit_job.py --algo pagerank-milli ...`` from a SCRATCH cwd —
   ``fog_spark`` is importable only through the zip, so a zip packaging
   bug (missing subpackage, bad __init__) fails loudly here. Master
   defaults to ``local[4]``; pass e.g. ``local-cluster[2,2,1024]`` (argv
   1) to submit onto a MULTI-EXECUTOR cluster — two separate executor
   JVMs that each receive the zip via --py-files, the north rule's
   literal deployment shape;
4. read the output parquet back and compare every vertex against a
   pure-Python evaluation of the FOG recurrence
   (/root/reference/application/pagerank.hpp:37-94) — exact longs.

Exit 0 + one JSON line on success. Used by tests/test_spark_submit.py.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_VERTICES = 120
N_EDGES = 600
NITERS = 4


def build_zip(dest: str) -> str:
    """Package fog_spark/ exactly as a cluster submit would."""
    zpath = os.path.join(dest, "fog_spark.zip")
    pkg = os.path.join(REPO, "fog_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def synth_edges() -> list[tuple[int, int]]:
    """Deterministic multiplicative-congruential edge list — no RNG
    state, reproducible everywhere."""
    edges = []
    for i in range(N_EDGES):
        src = (i * 37 + 11) % N_VERTICES
        dst = (i * i * 53 + i * 29 + 7) % N_VERTICES
        edges.append((src, dst))
    return edges


def write_edges_parquet(path: str, edges: list[tuple[int, int]]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    pq.write_table(t, path)


def fog_pagerank_milli_oracle(edges: list[tuple[int, int]], niters: int) -> dict[int, int]:
    """rank_0=1_000_000; contrib(u)=(850*rank(u)) // (1000*outdeg(u)) +
    150_000; rank_t(v)=rank_{t-1}(v)+sum contribs. Exact long arithmetic,
    self-loops kept (GLOBAL semantics)."""
    verts = sorted({v for e in edges for v in e})
    outdeg: dict[int, int] = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: 1_000_000 for v in verts}
    for _ in range(niters):
        nxt = dict(rank)
        for a, b in edges:
            nxt[b] += (850 * rank[a]) // (1000 * outdeg[a]) + 150_000
        rank = nxt
    return rank


def main(master: str | None = None) -> int:
    master = master or (sys.argv[1] if len(sys.argv) > 1 else "local[4]")
    work = tempfile.mkdtemp(prefix="fog_spark_submit_")
    try:
        zpath = build_zip(work)
        edges = synth_edges()
        edges_pq = os.path.join(work, "edges.parquet")
        write_edges_parquet(edges_pq, edges)
        out_dir = os.path.join(work, "ranks_out")
        scratch = os.path.join(work, "scratch_cwd")  # no fog_spark here
        os.makedirs(scratch)
        shim = os.path.join(work, "submit_job.py")
        shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), shim)

        spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be the only source
        env.setdefault("PYSPARK_PYTHON", sys.executable)
        env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
        cmd = [
            spark_submit,
            "--master", master,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            shim,
            "--algo", "pagerank-milli",
            "--edges", edges_pq,
            "--pagerank-niters", str(NITERS),
            "--output", out_dir,
        ]
        proc = subprocess.run(
            cmd, cwd=scratch, env=env, capture_output=True, text=True, timeout=600
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:] + "\n")
            print(json.dumps({"ok": False, "stage": "spark-submit", "rc": proc.returncode}))
            return 1

        import pyarrow.parquet as pq

        got = {
            int(r["id"]): int(r["rank_milli"])
            for r in pq.read_table(out_dir).to_pylist()
        }
        want = fog_pagerank_milli_oracle(edges, NITERS)
        mismatches = {
            v: (got.get(v), want[v]) for v in want if got.get(v) != want[v]
        }
        ok = not mismatches and len(got) == len(want)
        print(
            json.dumps(
                {
                    "ok": ok,
                    "vertices": len(got),
                    "niters": NITERS,
                    "mismatches": len(mismatches),
                    "zip": os.path.basename(zpath),
                    "mode": f"spark-submit --py-files, scratch cwd, master={master}",
                }
            )
        )
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
