import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from fog_spark.session import get_spark

    s = get_spark("fog_spark_tests", cores=4, shuffle_partitions=8)
    yield s


def make_edges_df(spark, pairs, weighted=True):
    """Edge DataFrame from python (src, dst) pairs with the deterministic
    FIXTURES F2 weight rule (hash-derived, matches Spark xxhash64)."""
    from fog_spark.hashing import pmod, xxhash64

    rows = [
        (int(s), int(d), 1.0 + pmod(xxhash64(int(s), int(d)), 9000) / 1000.0)
        for s, d in pairs
    ]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return df if weighted else df.select("src", "dst")
