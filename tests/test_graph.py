from pyspark.sql import functions as F

from fog_spark import graph as G
from tests.conftest import make_edges_df
from tests.graphs import STAR_HUB, TWO_TRIANGLES


def test_degrees_and_stats(spark):
    e = make_edges_df(spark, STAR_HUB)
    out = {r["id"]: r["outdeg"] for r in G.out_degrees(e).collect()}
    assert out == {0: 9, 9: 1}
    ind = {r["id"]: r["indeg"] for r in G.in_degrees(e).collect()}
    assert ind == {i: 1 for i in range(1, 10)} | {0: 1}
    stats = G.graph_stats(e)
    assert stats == {
        "min_vertex_id": 0,
        "max_vertex_id": 9,
        "num_edges": 10,
        "max_out_edges": 9,
    }


def test_adjacency_grouping(spark):
    e = make_edges_df(spark, STAR_HUB)
    adj = G.build_adjacency(e).collect()
    rows = {r["src"]: r for r in adj}
    assert rows[0]["outdeg"] == 9
    assert sorted(rows[0]["dsts"]) == list(range(1, 10))
    assert rows[9]["dsts"] == [0]


def test_adjacency_weights_aligned(spark):
    e = make_edges_df(spark, STAR_HUB)
    adj = G.build_adjacency(e, with_weights=True).collect()
    wmap = {(r["src"], r["dst"]): r["weight"] for r in e.collect()}
    for r in adj:
        for d, w in zip(r["dsts"], r["weights"]):
            assert wmap[(r["src"], d)] == w


def test_salted_hub_split(spark):
    e = make_edges_df(spark, STAR_HUB)
    adj = G.build_adjacency(e, hub_cap=3).collect()
    hub_rows = [r for r in adj if r["src"] == 0]
    assert len(hub_rows) >= 2  # 9 out-edges, cap 3 -> >=3 expected chunks
    assert all(r["outdeg"] == 9 for r in hub_rows)  # total degree preserved
    got = sorted(d for r in hub_rows for d in r["dsts"])
    assert got == list(range(1, 10))
    assert max(len(r["dsts"]) for r in hub_rows) <= 9  # chunks bounded-ish (hash split)


def test_write_edges_sorted_layout(spark, tmp_path):
    """C5: the src-sorted range-partitioned writer (the .edge file layout,
    process_edgelist.cpp:118-126) — roundtrip plus physical ordering."""
    e = make_edges_df(spark, [((i * 37) % 50, (i * 11) % 50) for i in range(200)])
    path = str(tmp_path / "sorted_edges")
    G.write_edges_sorted(e, path, partitions=4)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.select("src", "dst", "weight").collect())) == sorted(
        map(tuple, e.collect())
    )
    # each parquet file is internally src-sorted, and files cover disjoint
    # src ranges (range partitioning) — vid locality like FOG's .edge
    import os

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) > 1
    ranges = []
    for f in sorted(files):
        rows = spark.read.parquet(os.path.join(path, f)).select("src").collect()
        srcs = [r["src"] for r in rows]
        assert srcs == sorted(srcs), f"{f} not src-sorted"
        if srcs:
            ranges.append((min(srcs), max(srcs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file src ranges overlap"


def test_symmetrize(spark):
    e = make_edges_df(spark, [(0, 1), (1, 0), (1, 1), (2, 1)])
    sym = sorted(tuple(r) for r in G.symmetrize(e).collect())
    assert sym == [(0, 1), (1, 0), (1, 2), (2, 1)]


def test_in_adjacency(spark):
    e = make_edges_df(spark, TWO_TRIANGLES)
    adj_in = {r["dst"]: sorted(r["srcs"]) for r in G.build_in_adjacency(e).collect()}
    assert adj_in[0] == [1, 2]
    assert adj_in[4] == [3, 5]


def _census_oracle(pairs):
    """Pure-Python replay of graph.census_stats' definitions."""
    import math

    e = {(s, d) for s, d in pairs if s != d}
    n = len(e)
    nr = sum(1 for s, d in e if (d, s) in e)
    od, idg = {}, {}
    for s, d in e:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    xs = [od[s] for s, d in e]
    ys = [idg[d] for s, d in e]
    sums = {
        "n_directed": n,
        "n_reciprocal": nr,
        "reciprocity_permille": (1000 * nr) // n if n else 0,
        "sxo": sum(xs),
        "syi": sum(ys),
        "sxy": sum(x * y for x, y in zip(xs, ys)),
        "sx2": sum(x * x for x in xs),
        "sy2": sum(y * y for y in ys),
    }
    dx = n * sums["sx2"] - sums["sxo"] ** 2
    dy = n * sums["sy2"] - sums["syi"] ** 2
    num = n * sums["sxy"] - sums["sxo"] * sums["syi"]
    r = num / math.sqrt(dx * dy) if dx > 0 and dy > 0 else None
    return sums, r


def test_census_stats_fixtures(spark):
    """Reciprocity + assortativity sums vs a pure-Python oracle on every
    fixture graph plus a seeded random multigraph (dup edges + self-loops
    exercise the distinct/loop-free contract)."""
    import math

    from tests.graphs import ALL_GRAPHS

    cases = {name: pairs for name, (pairs, _n) in ALL_GRAPHS.items()}
    cases["random_multi"] = [
        ((i * 37 + j) % 23, (i * 11 + 5 * j) % 23) for i in range(300) for j in (0, 1)
    ]
    for name, pairs in cases.items():
        want, r_want = _census_oracle(pairs)
        row = G.census_stats(make_edges_df(spark, pairs)).collect()[0].asDict()
        assert row == want, name
        # the one float derived from the integer sums matches plain Pearson
        dx = row["n_directed"] * row["sx2"] - row["sxo"] ** 2
        dy = row["n_directed"] * row["sy2"] - row["syi"] ** 2
        if r_want is not None:
            r_got = (row["n_directed"] * row["sxy"] - row["sxo"] * row["syi"]) / math.sqrt(dx * dy)
            assert abs(r_got - r_want) < 1e-12, name


def test_census_reciprocity_values(spark):
    # TWO_TRIANGLES is fully reciprocal; STAR_HUB's only reciprocated
    # pair is 0<->9 (2 of its 10 edges)
    full = G.census_stats(make_edges_df(spark, TWO_TRIANGLES)).collect()[0]
    assert full["reciprocity_permille"] == 1000
    star = G.census_stats(make_edges_df(spark, STAR_HUB)).collect()[0]
    assert star["n_reciprocal"] == 2 and star["reciprocity_permille"] == 200


def test_census_empty_and_selfloop_only(spark):
    # only self-loops -> empty loop-free set: all zeros, no ANSI
    # DIVIDE_BY_ZERO (review finding)
    row = G.census_stats(make_edges_df(spark, [(1, 1), (2, 2)])).collect()[0]
    assert row.asDict() == {
        "n_directed": 0, "n_reciprocal": 0, "reciprocity_permille": 0,
        "sxo": 0, "syi": 0, "sxy": 0, "sx2": 0, "sy2": 0,
    }


def test_ranked_out_edges_chunked_equals_window(spark):
    """The hub path (range-chunked two-phase rank) must produce the
    EXACT global ascending-dst rank the single-window path produces —
    byte-identical walk corpora depend on it. Forced via hub_threshold=1
    on graphs with multi-edges and shared prefixes."""
    from pyspark.sql import functions as F

    from tests.graphs import ALL_GRAPHS

    for name in ("two_triangles", "star_hub", "chain", "cycle_pair"):
        if name not in ALL_GRAPHS:
            continue
        edges, _n = ALL_GRAPHS[name]
        e = make_edges_df(spark, edges)
        win = {
            (r["src"], r["idx"]): r["dst"]
            for r in G.ranked_out_edges(e, hub_threshold=10**9).collect()
        }
        chunked = {
            (r["src"], r["idx"]): r["dst"]
            for r in G.ranked_out_edges(
                e, n_chunks=4, hub_threshold=1, sample_target=8
            ).collect()
        }
        assert chunked == win, name
    # multi-edges: an edge listed twice occupies two consecutive idx slots
    e = make_edges_df(spark, [(0, 5), (0, 5), (0, 3)])
    got = {
        (r["src"], r["idx"]): r["dst"]
        for r in G.ranked_out_edges(e, n_chunks=4, hub_threshold=1,
                                    sample_target=8).collect()
    }
    assert got == {(0, 0): 3, (0, 1): 5, (0, 2): 5}


def test_ranked_out_edges_hub_bounded_groups(spark):
    """Planted 100k-out-degree hub: the chunked build's window partition
    key (src, chunk) must split the hub into groups far smaller than its
    degree (r04 verdict finding #2), while idx still equals the exact
    global rank."""
    from pyspark.sql import functions as F

    D = 100_000
    hub = spark.range(D).select(
        F.lit(7).cast("long").alias("src"), (F.col("id") * 13 + 1).alias("dst")
    )
    tail = spark.range(50).select(
        (F.col("id") + 100).alias("src"), (F.col("id") * 7).alias("dst")
    )
    e = hub.unionByName(tail)
    ranked = G.ranked_out_edges(e, hub_threshold=50_000)
    # exact rank: the hub's dsts are 1, 14, 27, ... so idx * 13 + 1 = dst
    mism = ranked.where(
        (F.col("src") == 7) & (F.col("dst") != F.col("idx") * 13 + 1)
    ).count()
    assert mism == 0
    assert ranked.count() == D + 50
    # load balance: replay the production cuts/chunk mapping and assert
    # no (src, chunk) group approaches the hub's degree
    cuts = G._sample_rank_cuts(e.select("src", "dst"), 64, 65_536, D + 50)
    assert len(cuts) > 8
    sizes = (
        e.withColumn("_b", G.rank_chunk_expr(F.col("dst"), cuts))
        .groupBy("src", "_b")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert sizes < D // 8, sizes
