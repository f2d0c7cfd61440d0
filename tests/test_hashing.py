import numpy as np

from fog_spark.hashing import pmod, xxh64_int, xxhash64, xxhash64_vec


def test_matches_spark_longs(spark):
    vals = [0, 1, -1, 7, 123456789012345, -987654321, 2**62]
    exprs = [f"xxhash64(cast({v} as long)) as h{i}" for i, v in enumerate(vals)]
    row = spark.range(1).selectExpr(*exprs).collect()[0]
    for i, v in enumerate(vals):
        assert row[f"h{i}"] == xxhash64(v)


def test_matches_spark_chain_and_strings(spark):
    row = spark.range(1).selectExpr(
        "xxhash64(cast(3 as long), cast(9 as long)) as a",
        "xxhash64('') as b",
        "xxhash64('abc') as c",
        "xxhash64('a fairly long string that exceeds the thirty-two byte block') as d",
        "xxhash64(cast(5 as long), 'tok') as e",
        "xxhash64(cast(1 as int)) as f",
    ).collect()[0]
    assert row["a"] == xxhash64(3, 9)
    assert row["b"] == xxhash64("")
    assert row["c"] == xxhash64("abc")
    assert row["d"] == xxhash64("a fairly long string that exceeds the thirty-two byte block")
    assert row["e"] == xxhash64(5, "tok")
    assert row["f"] == xxh64_int(1)


def test_vectorized_agrees_with_scalar():
    arr = np.array([0, 1, -5, 99, 2**40], dtype=np.int64)
    v = xxhash64_vec(arr)
    for i, x in enumerate(arr):
        assert v[i] == xxhash64(int(x))
    v2 = xxhash64_vec(arr, arr + 1)
    for i, x in enumerate(arr):
        assert v2[i] == xxhash64(int(x), int(x) + 1)


def test_pmod():
    assert pmod(-3, 8) == 5
    assert pmod(11, 8) == 3
    a = pmod(np.array([-3, 11]), 8)
    assert list(a) == [5, 3]
