"""Incremental triangle delta (algos/triangles.triangle_delta): the
delta-local count must equal the full-recount difference on every graph
pair — the invariant IS the oracle."""

from fog_spark.algos.triangles import triangle_count, triangle_delta
from tests.conftest import make_edges_df
from tests.graphs import TWO_TRIANGLES


def _check(spark, old_pairs, new_pairs):
    old = make_edges_df(spark, old_pairs) if old_pairs else _empty(spark)
    new = make_edges_df(spark, new_pairs) if new_pairs else _empty(spark)
    row = triangle_delta(old, new).collect()[0]
    want = triangle_count(new) - triangle_count(old)
    assert row["delta"] == want, (old_pairs, new_pairs, row.asDict(), want)
    return row


def _empty(spark):
    return spark.createDataFrame([], "src long, dst long")


def test_hand_cases(spark):
    # add one closing edge -> +1 triangle
    row = _check(spark, [(0, 1), (1, 2)], [(0, 1), (1, 2), (2, 0)])
    assert row.asDict() == {
        "n_added": 1, "n_removed": 0, "tri_gained": 1, "tri_lost": 0, "delta": 1,
    }
    # remove one edge of a triangle -> -1
    row = _check(spark, [(0, 1), (1, 2), (2, 0)], [(0, 1), (1, 2)])
    assert row["delta"] == -1 and row["tri_lost"] == 1
    # unchanged graph -> all zeros
    row = _check(spark, TWO_TRIANGLES, TWO_TRIANGLES)
    assert row["delta"] == 0 and row["n_added"] == 0 and row["n_removed"] == 0
    # whole graph new (old empty) -> delta == full count
    row = _check(spark, [], TWO_TRIANGLES)
    assert row["tri_gained"] == 2 and row["delta"] == 2


def test_multi_delta_edge_triangles(spark):
    # a triangle with TWO added edges (k=2 inclusion-exclusion) and one
    # with THREE (k=3): naive per-edge counting would over-count
    base = [(0, 1)]
    new = [(0, 1), (1, 2), (2, 0),  # k=2: (1,2),(2,0) added, (0,1) old
           (5, 6), (6, 7), (7, 5)]  # k=3: all added
    row = _check(spark, base, new)
    assert row["tri_gained"] == 2 and row["delta"] == 2
    # and the mirror: removing those edges loses the same triangles
    row = _check(spark, new, base)
    assert row["tri_lost"] == 2 and row["delta"] == -2


def test_seeded_random_perturbations(spark):
    """Random base graphs with random add/remove perturbations; the
    invariant (delta == recount difference) must hold for each."""
    import random

    rng = random.Random(77)
    for trial in range(4):
        n = 24
        base = {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(90)
            )
            if a != b
        }
        removed = set(rng.sample(sorted(base), k=len(base) // 5))
        added = {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(25))
            if a != b
        } - base
        new = (base - removed) | added
        _check(spark, sorted(base), sorted(new))


def test_mixed_add_remove_same_triangle_region(spark):
    # edges added AND removed around the same vertices: gained counts in
    # the NEW graph, lost in the OLD, so swaps resolve exactly
    old = [(0, 1), (1, 2), (2, 0), (2, 3)]
    new = [(0, 1), (1, 2), (1, 3), (2, 3), (0, 3)]  # drop (2,0), add (1,3),(0,3)
    _check(spark, old, new)


def test_shared_frames_cached_and_reclaimed(spark):
    """triangle_delta checkpoints its four shared frames (old/new
    canonical sets, added/removed) so the ~8 downstream actions scan
    cached RDDs instead of re-paying the canonicalization and anti-joins
    (verdict r04 finding #1) — and frees every block on exit: the
    persistent-RDD census must return to its pre-call value even on the
    both-sides-active path."""
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    old = make_edges_df(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    new = make_edges_df(spark, [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3), (3, 5), (0, 4)])
    row = triangle_delta(old, new).collect()[0]
    assert row["delta"] == triangle_count(new) - triangle_count(old)
    assert sc._jsc.getPersistentRDDs().size() == before


def test_cli_triangle_delta(spark, tmp_path):
    from fog_spark.__main__ import main

    old_pq, new_pq = tmp_path / "old_pq", tmp_path / "new_pq"
    make_edges_df(spark, [(0, 1), (1, 2)]).write.parquet(str(old_pq))
    make_edges_df(spark, [(0, 1), (1, 2), (2, 0)]).write.parquet(str(new_pq))
    out = tmp_path / "td_out"
    assert main(
        ["--algo", "triangle-delta", "--edges", str(new_pq),
         "--edges-old", str(old_pq), "--output", str(out)],
        spark=spark,
    ) == 0
    assert spark.read.parquet(str(out)).collect()[0]["delta"] == 1
    import pytest

    with pytest.raises(SystemExit):
        main(["--algo", "triangle-delta", "--edges", str(new_pq)], spark=spark)
