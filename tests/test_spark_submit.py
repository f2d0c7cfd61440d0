"""Deployment-shape test: a real ``spark-submit --py-files fog_spark.zip``
run (north rule: "run via spark-submit --py-files on a multi-executor
cluster") from a scratch cwd, validated against a pure-Python evaluation
of the FOG recurrence. See tools/spark_submit_check.py for the protocol."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None
    and not os.path.exists("/opt/spark/bin/spark-submit"),
    reason="spark-submit not installed",
)
def test_spark_submit_py_files_end_to_end():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "spark_submit_check.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["mismatches"] == 0
    assert report["vertices"] > 0


@pytest.mark.skipif(
    shutil.which("spark-submit") is None
    and not os.path.exists("/opt/spark/bin/spark-submit"),
    reason="spark-submit not installed",
)
def test_spark_submit_multi_executor_cluster():
    """The north rule's literal deployment: spark-submit --py-files onto
    a MULTI-EXECUTOR master. local-cluster[2,2,1024] launches two
    separate executor JVM processes (own heap/shuffle server) that each
    get fog_spark only through the shipped zip; results must match the
    same exact-long oracle as the local[4] run."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "spark_submit_check.py"),
            "local-cluster[2,2,1024]",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["mismatches"] == 0
    assert "local-cluster[2,2,1024]" in report["mode"]
