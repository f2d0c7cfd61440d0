"""Spam mass vs a pure-Python replay of the exact integer recurrences."""

import pytest
from pyspark.sql import functions as F

from fog_spark.algos.spam import UniformPageRankMilli, spam_mass_milli


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark's `div`)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# trusted core 0<->1 feeding a legit chain 2->3; spam farm 4,5,6 -> 7
# with 7 linking back to inflate itself; 3->7 gives the target a little
# legit inflow so its pr is not purely farm-made
EDGES = [
    (0, 1), (1, 0), (0, 2), (2, 3),
    (4, 7), (5, 7), (6, 7), (7, 4), (4, 5), (5, 6), (6, 4),
    (3, 7),
]
SEEDS = [0, 1]
NITERS = 6


def _oracle():
    verts = sorted({v for e in EDGES for v in e})
    out = {v: [d for s, d in EDGES if s == v] for v in verts}
    k = len(SEEDS)

    def power(init, boost):
        rank = dict(init)
        for _ in range(NITERS):
            nxt = {v: boost.get(v, 0) for v in verts}
            for u in verts:
                deg = len(out[u])
                if deg == 0 or rank[u] == 0:
                    continue
                c = _tdiv(850 * rank[u], 1000 * deg)
                for d in out[u]:
                    nxt[d] += c
            rank = nxt
        return rank

    pr = power({v: 1_000_000 for v in verts}, {v: 150_000 for v in verts})
    tr = power(
        {v: (1_000_000 // k if v in SEEDS else 0) for v in verts},
        {v: 150_000 // k for v in SEEDS},
    )
    s_pr, s_tr = sum(pr.values()), sum(tr.values())
    rows = {}
    for v in verts:
        tn = _tdiv(tr[v] * s_pr, s_tr) if s_tr > 0 else 0
        rows[v] = (pr[v], tn, _tdiv((pr[v] - tn) * 1000, pr[v]))
    return rows


def test_spam_mass_exact_vs_python_oracle(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r.id: (r.pr_milli, r.trust_milli, r.spam_permille)
        for r in spam_mass_milli(spark, e, SEEDS, niters=NITERS).collect()
    }
    assert got == _oracle()


def test_spam_mass_separates_farm_from_trusted(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    sm = {r.id: r.spam_permille
          for r in spam_mass_milli(spark, e, SEEDS, niters=NITERS).collect()}
    # farm vertices hold rank almost entirely through untrusted links
    for farm in (4, 5, 6):
        assert sm[farm] > 500
    # the target gets some legit inflow (3 -> 7) but stays spam-shaped,
    # well above every legit page
    assert sm[7] > 300
    assert sm[7] > max(sm[2], sm[3])
    # trusted core and its chain hold MORE trust-sourced mass than rank
    assert sm[0] < 0 and sm[1] < 0 and sm[2] < 0 and sm[3] < 0
    # every score is bounded above by 1000 by construction
    assert all(v <= 1000 for v in sm.values())


def test_uniform_pagerank_milli_mass_conserved_shape(spark):
    """Sanity on the uniform twin: a 3-cycle (outdeg 1 everywhere, no
    dangling) keeps every vertex at the closed-form fixpoint."""
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    from fog_spark.plans.engine import ScatterGatherEngine

    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    res = eng.run(UniformPageRankMilli(niters=4), e, max_iters=4)
    ranks = {r.id: r.rank_milli for r in res.state.collect()}
    # replay: r_{t} = (850*r_{t-1}) div 1000 + 150000, r_0 = 1e6
    r = 1_000_000
    for _ in range(4):
        r = (850 * r) // 1000 + 150_000
    assert ranks == {0: r, 1: r, 2: r}


def test_spam_mass_refuses_absent_trust_seeds(spark):
    # ADVICE r03: a typo'd seed set accumulating zero trust must raise,
    # not silently score every vertex spam_permille=1000
    import pytest

    from fog_spark.algos.spam import spam_mass_milli
    from tests.conftest import make_edges_df

    e = make_edges_df(spark, [(0, 1), (1, 2), (2, 0)], weighted=False)
    with pytest.raises(ValueError, match="no trust mass"):
        spam_mass_milli(spark, e, trust_seeds=[999], niters=2)
