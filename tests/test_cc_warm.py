"""Warm-start connected components: identical labels to a cold run on
the updated graph, fewer iterations, delta-frontier variant included."""

from pyspark.sql import functions as F

from fog_spark.algos.components import ConnectedComponents, WarmStartCC
from fog_spark.plans.engine import ScatterGatherEngine
from tests.conftest import make_edges_df


def _engine(spark):
    return ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)


def _labels(res):
    return {r["id"]: r["component"] for r in res.state.collect()}


# two long paths (0..9) and (20..29), disjoint; the update bridges them
# and attaches a brand-new vertex 40
OLD = [(i, i + 1) for i in range(9)] + [(i, i + 1) for i in range(20, 29)]
ADDED = [(9, 20), (29, 40)]
NEW = OLD + ADDED


def test_warm_equals_cold_after_merge(spark):
    e_old = make_edges_df(spark, OLD, weighted=False)
    e_new = make_edges_df(spark, NEW, weighted=False)
    cold_old = _engine(spark).run(ConnectedComponents(), e_old)
    cold_new = _engine(spark).run(ConnectedComponents(), e_new)
    prev = cold_old.state.select("id", "component")

    warm = _engine(spark).run(WarmStartCC(prev), e_new)
    assert _labels(warm) == _labels(cold_new)
    # old labels are per-component fixpoints: re-percolation is the merge
    # propagation only, strictly fewer rounds than the cold label ladder
    assert warm.iterations < cold_new.iterations


def test_warm_with_delta_frontier(spark):
    e_old = make_edges_df(spark, OLD, weighted=False)
    e_new = make_edges_df(spark, NEW, weighted=False)
    cold_new = _engine(spark).run(ConnectedComponents(), e_new)
    prev = _engine(spark).run(ConnectedComponents(), e_old).state.select(
        "id", "component"
    )
    added = make_edges_df(spark, ADDED, weighted=False)

    warm = _engine(spark).run(WarmStartCC(prev, added_edges=added), e_new)
    assert _labels(warm) == _labels(cold_new)


def test_warm_noop_delta_converges_immediately(spark):
    # unchanged graph + empty delta: nothing starts active, labels are
    # already the fixpoint, engine must terminate without label churn
    e = make_edges_df(spark, OLD, weighted=False)
    prev = _engine(spark).run(ConnectedComponents(), e).state.select(
        "id", "component"
    )
    added = spark.createDataFrame([], "src long, dst long")
    warm = _engine(spark).run(WarmStartCC(prev, added_edges=added), e)
    assert _labels(warm) == {r["id"]: r["component"] for r in prev.collect()}
    assert warm.iterations <= 1


def test_cli_cc_warm(spark, tmp_path):
    from fog_spark.__main__ import main

    e_old = make_edges_df(spark, OLD, weighted=False)
    e_new = make_edges_df(spark, NEW)
    prev = _engine(spark).run(ConnectedComponents(), e_old).state.select(
        "id", "component"
    )
    labels_pq = tmp_path / "labels"
    prev.write.parquet(str(labels_pq))
    edges_pq = tmp_path / "edges"
    e_new.write.parquet(str(edges_pq))
    added_pq = tmp_path / "added"
    make_edges_df(spark, ADDED, weighted=False).write.parquet(str(added_pq))
    out = tmp_path / "out"
    rc = main(
        [
            "--algo", "cc-warm", "--edges", str(edges_pq), "--format", "parquet",
            "--warm-labels", str(labels_pq), "--edges-added", str(added_pq),
            "--output", str(out),
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["id"]: r["component"] for r in spark.read.parquet(str(out)).collect()}
    cold = _labels(_engine(spark).run(ConnectedComponents(), e_new))
    assert got == cold


def test_warm_new_vertices_start_cold(spark):
    # vertex 40 absent from prev labels must come out labeled with its
    # merged component's min (0 after the bridge), not null/own-id
    e_old = make_edges_df(spark, OLD, weighted=False)
    e_new = make_edges_df(spark, NEW, weighted=False)
    prev = _engine(spark).run(ConnectedComponents(), e_old).state.select(
        "id", "component"
    )
    warm = _engine(spark).run(WarmStartCC(prev), e_new)
    labels = _labels(warm)
    assert labels[40] == 0
    assert len(set(labels.values())) == 1


def test_cli_cc_warm_refuses_deletions(spark, tmp_path):
    # ADVICE r03: with --edges-old supplied, the CLI verifies the
    # additions-only contract via edge-delta and refuses warm start when
    # edges were removed (a deletion can split a component, which warm
    # hash-min labels can never raise)
    import pytest

    from fog_spark.__main__ import main

    e_old = make_edges_df(spark, OLD, weighted=False)
    prev = _engine(spark).run(ConnectedComponents(), e_old).state.select(
        "id", "component"
    )
    labels_pq = tmp_path / "labels"
    prev.write.parquet(str(labels_pq))
    old_pq = tmp_path / "old_edges"
    e_old.write.parquet(str(old_pq))

    # new graph DROPS one old edge (splits the 0..9 path) and adds the bridge
    dropped = [p for p in OLD if p != (4, 5)] + ADDED
    new_pq = tmp_path / "new_edges"
    make_edges_df(spark, dropped, weighted=False).write.parquet(str(new_pq))
    with pytest.raises(SystemExit, match="additions-only"):
        main(
            [
                "--algo", "cc-warm", "--edges", str(new_pq), "--format", "parquet",
                "--warm-labels", str(labels_pq), "--edges-old", str(old_pq),
                "--output", str(tmp_path / "out_refused"),
            ],
            spark=spark,
        )

    # additions-only delta passes the same guard and matches the cold run
    add_pq = tmp_path / "add_edges"
    e_new = make_edges_df(spark, NEW, weighted=False)
    e_new.write.parquet(str(add_pq))
    out = tmp_path / "out_ok"
    rc = main(
        [
            "--algo", "cc-warm", "--edges", str(add_pq), "--format", "parquet",
            "--warm-labels", str(labels_pq), "--edges-old", str(old_pq),
            "--output", str(out),
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["id"]: r["component"] for r in spark.read.parquet(str(out)).collect()}
    assert got == _labels(_engine(spark).run(ConnectedComponents(), e_new))
