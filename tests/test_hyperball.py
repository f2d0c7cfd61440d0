"""HyperBall sketches vs the pure-Python oracle + estimator sanity."""

import pytest

from fog_spark.algos.hyperball import (
    HyperBall,
    hll_estimate,
    hyperball_sketches,
)
from tests.conftest import make_edges_df
from tests import graphs as GX

GRAPH_IDS = list(GX.ALL_GRAPHS)


def test_hyperball_param_validation():
    with pytest.raises(ValueError):
        HyperBall(m=12)
    with pytest.raises(ValueError):
        HyperBall(m=128)


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
@pytest.mark.parametrize("gname", GRAPH_IDS)
def test_hyperball_match_oracle(spark, gname, hash_fn):
    edges, n = GX.ALL_GRAPHS[gname]
    got = {
        r["id"]: (r["sum2k"], r["zeros"])
        for r in hyperball_sketches(
            make_edges_df(spark, edges), m=16, rounds=6, hash_fn=hash_fn
        ).collect()
    }
    want = GX.hyperball_oracle(edges, m=16, rounds=6, hash_fn=hash_fn)
    assert got == want, (gname, hash_fn)


def test_hyperball_estimate_tracks_exact_reachability(spark):
    # 40-vertex directed cycle: after r rounds every in-ball has exactly
    # r+1 vertices. Linear counting at these cardinalities keeps the
    # m=64 estimate within ~15% — enough to pin the estimator's shape.
    from pyspark.sql import functions as F

    edges = [(i, (i + 1) % 40) for i in range(40)]
    for rounds, exact in [(2, 3), (6, 7)]:
        sk = hyperball_sketches(
            make_edges_df(spark, edges), m=64, rounds=rounds, hash_fn="md5"
        )
        rho_max = 48 - 6 + 1
        avg = sk.select(
            F.avg(hll_estimate(64, rho_max)).alias("e")
        ).collect()[0]["e"]
        assert abs(avg - exact) / exact < 0.15, (rounds, avg, exact)


def test_hyperball_deterministic_across_partitioning(spark):
    edges, n = GX.ALL_GRAPHS["star_hub"]
    df = make_edges_df(spark, edges)
    a = sorted(map(tuple, hyperball_sketches(df, m=16, rounds=4).collect()))
    b = sorted(
        map(tuple, hyperball_sketches(df.repartition(5), m=16, rounds=4).collect())
    )
    assert a == b


def test_neighborhood_function_single_run(spark):
    # 40-vertex directed cycle: |ball(v, r)| = r + 1 exactly, so
    # N_est(r) ~ 40 * (r + 1). One engine run must yield every radius
    # (rounds+1 points, radius 0 included) — the former per-prefix
    # re-run was O(rounds^2) total merge rounds (ADVICE r02).
    from fog_spark.algos.hyperball import neighborhood_function

    edges = [(i, (i + 1) % 40) for i in range(40)]
    nf = neighborhood_function(
        make_edges_df(spark, edges), m=64, rounds=4, hash_fn="md5"
    )
    assert [r for r, _ in nf] == [0, 1, 2, 3, 4]
    for r, est in nf:
        exact = 40 * (r + 1)
        assert abs(est - exact) / exact < 0.15, (r, est, exact)
    # monotone: balls only grow
    vals = [est for _, est in nf]
    assert all(b >= a * 0.999 for a, b in zip(vals, vals[1:]))
    # per-radius values match independent bounded-round runs bit-for-bit
    # modulo float sum order (the sketches themselves are exact integers)
    from pyspark.sql import functions as F
    from fog_spark.algos.hyperball import hll_estimate, hyperball_sketches

    for r in (0, 2):
        sk = hyperball_sketches(
            make_edges_df(spark, edges), m=64, rounds=r, hash_fn="md5"
        )
        want = sk.select(F.sum(hll_estimate(64, 48 - 6 + 1)).alias("e")).collect()[0]["e"]
        assert abs(nf[r][1] - want) < 1e-6 * abs(want), r


def test_effective_diameter_path_graph(spark):
    # directed path 0->1->...->19: N(r) = sum_{v} |ball(v,r)| =
    # 20 + sum of min(r, dist-to-end) ~ exact closed form; the q=1.0
    # diameter must land near 19, q=0.5 well below it, and a clique's
    # effective diameter is ~1
    from fog_spark.algos.hyperball import effective_diameter

    path = [(i, i + 1) for i in range(19)]
    d_full = effective_diameter(
        make_edges_df(spark, path), q=1.0, m=64, max_rounds=24, hash_fn="md5"
    )
    assert 17.0 <= d_full <= 24.0, d_full
    d_half = effective_diameter(
        make_edges_df(spark, path), q=0.5, m=64, max_rounds=24, hash_fn="md5"
    )
    assert d_half < d_full and d_half >= 1.0, (d_half, d_full)

    clique = [(i, j) for i in range(8) for j in range(8) if i != j]
    d_cl = effective_diameter(
        make_edges_df(spark, clique), q=0.9, m=64, max_rounds=6, hash_fn="md5"
    )
    assert d_cl <= 1.1, d_cl


def test_effective_diameter_validation(spark):
    from fog_spark.algos.hyperball import effective_diameter

    with pytest.raises(ValueError):
        effective_diameter(make_edges_df(spark, [(0, 1)]), q=0.0)
