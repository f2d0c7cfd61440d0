"""Mirror-host detection vs a hand-built replicated-content fixture."""

from fog_spark.operators.mirrors import host_fingerprints, mirror_hosts


def _pages(spark):
    rows = []
    # a.example and b.example mirror each other: 4 identical bodies
    for i in range(4):
        rows.append((f"http://a.example/p{i}", f"unique body {i} " * 5))
        rows.append((f"http://b.example/p{i}", f"unique body {i} " * 5))
    # b also has one extra page of its own
    rows.append(("http://b.example/extra", "only on b"))
    # c shares exactly ONE body with a (below min_shared=2)
    rows.append(("http://c.example/p0", "unique body 0 " * 5))
    rows.append(("http://c.example/own", "c's own content"))
    # boilerplate body served by EVERY host (cap must exclude it)
    for h in ("a", "b", "c", "d", "e", "f"):
        rows.append((f"http://{h}.example/boiler", "shared boilerplate"))
    return spark.createDataFrame(rows, "url string, text string")


def test_mirror_pair_found_with_full_overlap(spark):
    got = {
        (r.host_a, r.host_b): r
        for r in mirror_hosts(_pages(spark), min_shared=2, max_fp_hosts=3).collect()
    }
    assert set(got) == {("a.example", "b.example")}
    r = got[("a.example", "b.example")]
    assert r.shared == 4
    # kept sizes: boilerplate fp (6 hosts > cap 3) is excluded everywhere
    assert r.size_a == 4 and r.size_b == 5
    assert r.overlap_permille == 1000  # a fully contained in b


def test_min_shared_one_also_finds_partial(spark):
    got = {
        (r.host_a, r.host_b)
        for r in mirror_hosts(_pages(spark), min_shared=1, max_fp_hosts=3).collect()
    }
    assert ("a.example", "c.example") in got
    assert ("b.example", "c.example") in got


def test_boilerplate_cap_prevents_all_pairs(spark):
    # with the cap lifted, the boilerplate fp alone links all 6 hosts
    free = mirror_hosts(_pages(spark), min_shared=1, max_fp_hosts=100).count()
    capped = mirror_hosts(_pages(spark), min_shared=1, max_fp_hosts=3).count()
    assert free >= 15  # 6 choose 2 from boilerplate
    assert capped == 3  # (a,b), (a,c), (b,c) only


def test_host_fingerprints_distinct(spark):
    hf = host_fingerprints(_pages(spark))
    assert hf.count() == hf.distinct().count()
