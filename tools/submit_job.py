#!/usr/bin/env python
"""Cluster entry point for ``spark-submit --py-files fog_spark.zip``.

The north rule's deployment shape (reference invocation analog:
``fog -g graph.desc -a pagerank``, /root/reference/README.txt:41-58) is

    spark-submit --master <cluster> --py-files fog_spark.zip \
        tools/submit_job.py --algo pagerank --edges s3://.../edges \
        --output s3://.../ranks --pagerank-niters 10

This file is deliberately a THIN shim: it must import ``fog_spark`` from
the ``--py-files`` zip (it carries no engine code itself), build the
session from whatever master/conf spark-submit provided (no local[]
override — the session factory's local defaults are for tests), and
delegate to the same CLI surface ``python -m fog_spark`` exposes, so the
local and cluster paths cannot drift.

``tools/spark_submit_check.py`` (and tests/test_spark_submit.py) run this
end-to-end with a real spark-submit from a scratch cwd where ``fog_spark``
is importable ONLY through the zip.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    # master/deploy-mode/conf all come from spark-submit; only fill the
    # bits the engine needs and spark-submit does not set by default.
    spark = (
        SparkSession.builder.appName("fog_spark_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from fog_spark.__main__ import main as cli_main  # resolved from --py-files

    return cli_main(argv, spark=spark)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
