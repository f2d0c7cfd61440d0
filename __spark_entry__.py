"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship link-graph query on sf0.001;
``queries()`` exposes one DataFrame callable per implemented operator
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.

Design notes for oracle exactness (the driver hash-compares values):
- graph algorithms run on the deterministic orders-derived edge table
  (FIXTURES.md F5): src=o_custkey, dst=o_orderkey%151 — identically
  expressible in SQL.
- iterative fixpoints use INTEGER milli-unit arithmetic (FogPageRankMilli,
  milli SSSP weights, SpMV milli) so Spark and DuckDB agree bit-for-bit;
  float PageRank's 1e-6 parity is covered by the pytest NumPy oracles.
- text operators use md5-portable hashing and raw IEEE per-row doubles
  (no ROUND: half-way rules differ across engines; raw per-row FP math
  does not).
- bounded-iteration semantics (sssp16, lpa5, bfs level<100) are pinned
  identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------- SQL bits

EDGES = (
    "SELECT CAST(o_custkey AS BIGINT) AS src, CAST(o_orderkey % 151 AS BIGINT) AS dst, "
    "1.0 + ((o_orderkey * 7 + o_custkey * 13) % 9000) / 1000.0 AS weight FROM orders"
)
EDGES_MILLI = (
    "SELECT CAST(o_custkey AS BIGINT) AS src, CAST(o_orderkey % 151 AS BIGINT) AS dst, "
    "CAST(1000 + ((o_orderkey * 7 + o_custkey * 13) % 9000) AS BIGINT) AS wm FROM orders"
)
VERTS = "SELECT src AS id FROM e UNION SELECT dst FROM e"
# EDGES_MILLI plus a planted hub: vertex 0 gets one edge per order row
# (outdeg 15k at sf0.01, far above the hub query's engine cap of 64), so
# hub-salting x needs_weights x frontier interact under the oracle — the
# F4 fixture pattern (tests/graphs.py) at gate scale. Multi-edges to the
# same dst carry different weights; SSSP's MIN gather resolves them
# identically on both engines.
HUB_EDGES_MILLI = (
    f"{EDGES_MILLI} UNION ALL "
    "SELECT CAST(0 AS BIGINT) AS src, CAST(1000 + (o_orderkey % 300) AS BIGINT) AS dst, "
    "CAST(1000 + ((o_orderkey * 11) % 4000) AS BIGINT) AS wm FROM orders"
)
TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)"


def _pagerank_milli_sql(niters: int, tail: str) -> str:
    # AS MATERIALIZED: DuckDB inlines CTEs by default, and each r{k}
    # references r{k-1} twice — inlining would expand to 2^niters scans
    # (at 16 rounds that exhausts the fd limit before it gets slow).
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        f"v AS MATERIALIZED ({VERTS})",
        "d AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS rank_milli FROM v)",
    ]
    for k in range(1, niters + 1):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT p.id, CAST(p.rank_milli + COALESCE(m.s, 0) AS BIGINT) AS rank_milli "
            f"FROM r{k-1} p LEFT JOIN ("
            f"SELECT e.dst AS id, SUM((850 * r.rank_milli) // (1000 * d.outdeg) + 150000) AS s "
            f"FROM r{k-1} r JOIN d ON d.src = r.id JOIN e ON e.src = r.id GROUP BY e.dst"
            f") m ON m.id = p.id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\n{tail.replace('$LAST', f'r{niters}')}"


def _wpagerank_milli_sql(
    niters: int,
    edges_sql: str = EDGES_MILLI,
    prologue: tuple[str, ...] = (),
    tail: str | None = None,
) -> str:
    """Unrolled WeightedPageRankMilli — mirrors
    fog_spark.algos.pagerank.WeightedPageRankMilli exactly: per-edge
    contrib = (850 * rank * wm) // (1000 * swm(u)) + 150000, multi-edges
    counted, integer wm (no float weight conversion). ``prologue`` CTEs
    may define tables ``edges_sql`` references; ``tail`` overrides the
    final SELECT (default: the raw (id, rank_milli) state)."""
    ctes = [
        *prologue,
        f"em AS MATERIALIZED ({edges_sql})",
        "v AS MATERIALIZED (SELECT src AS id FROM em UNION SELECT dst FROM em)",
        "sw AS MATERIALIZED (SELECT src, SUM(wm) AS swm FROM em GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS rank_milli FROM v)",
    ]
    for k in range(1, niters + 1):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT p.id, "
            f"CAST(p.rank_milli + COALESCE(m.s, 0) AS BIGINT) AS rank_milli "
            f"FROM r{k-1} p LEFT JOIN ("
            f"SELECT em.dst AS id, SUM((850 * r.rank_milli * em.wm) "
            f"// (1000 * s.swm) + 150000) AS s "
            f"FROM r{k-1} r JOIN sw s ON s.src = r.id "
            f"JOIN em ON em.src = r.id GROUP BY em.dst"
            f") m ON m.id = p.id)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + (tail or f"SELECT id, rank_milli FROM r{niters}")
    )


def _host_pagerank_sql(niters: int) -> str:
    """Oracle for the composed pages -> host-PageRank pipeline
    (host_pagerank4). The gate query's synthetic pages carry FORMULAIC
    outlinks, so the oracle derives the host edge multiset arithmetically
    from doc_id — fully independent of the Spark side's href regexp /
    host_of extraction — then replays dense-id assignment (rank in
    sorted host order, the assign_dense_ids contract) and the
    WeightedPageRankMilli recurrence with wm = 1000 * n_links."""
    host = "'h' || CAST({} % 23 AS VARCHAR) || '.test'"
    prologue = (
        "d AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS did FROM documents)",
        "lk AS MATERIALIZED ("
        f"SELECT {host.format('did')} AS src_host, {host.format('(did * 7 + 1)')} AS dst_host FROM d "
        f"UNION ALL SELECT {host.format('did')}, {host.format('(did * 13 + 5)')} FROM d "
        f"UNION ALL SELECT {host.format('did')}, {host.format('(did * 7 + 1)')} FROM d "
        "WHERE did % 3 = 0)",
        "hc AS MATERIALIZED (SELECT src_host, dst_host, COUNT(*) AS n "
        "FROM lk GROUP BY src_host, dst_host)",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM "
        "(SELECT src_host AS host FROM hc UNION SELECT dst_host FROM hc))",
        "dim AS MATERIALIZED (SELECT host, "
        "CAST(ROW_NUMBER() OVER (ORDER BY host) - 1 AS BIGINT) AS id FROM hosts)",
    )
    edges_sql = (
        "SELECT s.id AS src, t.id AS dst, CAST(n * 1000 AS BIGINT) AS wm "
        "FROM hc JOIN dim s ON s.host = hc.src_host "
        "JOIN dim t ON t.host = hc.dst_host"
    )
    tail = (
        f"SELECT dim.host AS host, r{niters}.rank_milli AS rank_milli "
        f"FROM r{niters} JOIN dim ON dim.id = r{niters}.id"
    )
    return _wpagerank_milli_sql(niters, edges_sql=edges_sql, prologue=prologue, tail=tail)


def _sssp_milli_sql(rounds: int, edges_sql: str | None = None) -> str:
    ctes = [
        f"em AS MATERIALIZED ({edges_sql or EDGES_MILLI})",
        "g AS MATERIALIZED (SELECT * FROM em WHERE src < dst)",
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM ("
            f"SELECT id, dist FROM d{k-1} "
            f"UNION ALL SELECT g.dst, r.dist + g.wm FROM d{k-1} r JOIN g ON g.src = r.id"
            f") GROUP BY id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, dist AS dist_milli FROM d{rounds}"
    )


def _msf_milli_sql(rounds: int, tail: str) -> str:
    """Unrolled Borůvka on the milli-weighted undirected graph, exactly
    mirroring fog_spark.algos.msf: per round every component picks its
    lightest incident edge under the strict total order (w, a, b) — which
    makes the forest unique — then components contract via a recursive
    min-label reachability CTE over the picked edges. 2^rounds >= initial
    components guarantees termination; later rounds are no-ops on empty
    CTEs. $FOREST in tail = UNION ALL of all rounds' picks."""
    ctes = [
        f"em AS MATERIALIZED ({EDGES_MILLI})",
        "und AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "MIN(wm) AS w FROM em WHERE src <> dst GROUP BY 1, 2)",
        "c0 AS MATERIALIZED (SELECT id, id AS comp FROM "
        "(SELECT a AS id FROM und UNION SELECT b FROM und))",
    ]
    for k in range(rounds):
        ctes += [
            f"live{k} AS MATERIALIZED (SELECT u.a, u.b, u.w, x.comp AS ca, y.comp AS cb "
            f"FROM und u JOIN c{k} x ON x.id = u.a JOIN c{k} y ON y.id = u.b "
            f"WHERE x.comp <> y.comp)",
            f"pick{k} AS MATERIALIZED (SELECT DISTINCT a, b, w, ca, cb FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, a, b) AS rn FROM ("
            f"SELECT ca AS c, a, b, w, ca, cb FROM live{k} "
            f"UNION ALL SELECT cb, a, b, w, ca, cb FROM live{k})) WHERE rn = 1)",
            f"m{k} AS MATERIALIZED (SELECT ca AS x, cb AS y FROM pick{k} "
            f"UNION SELECT cb, ca FROM pick{k})",
            f"reach{k}(c, lbl) AS (SELECT x, x FROM m{k} "
            f"UNION SELECT m.y, r.lbl FROM reach{k} r JOIN m{k} m ON m.x = r.c)",
            f"relbl{k} AS MATERIALIZED (SELECT c, MIN(lbl) AS lbl FROM reach{k} GROUP BY c)",
            f"c{k + 1} AS MATERIALIZED (SELECT p.id, COALESCE(r.lbl, p.comp) AS comp "
            f"FROM c{k} p LEFT JOIN relbl{k} r ON r.c = p.comp)",
        ]
    forest = " UNION ALL ".join(f"SELECT a, b, w FROM pick{k}" for k in range(rounds))
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f",\nforest AS MATERIALIZED ({forest})\n{tail}"
    )


def _ppr_milli_sql(seed: int, niters: int) -> str:
    """Unrolled integer-milli personalized PageRank (replace-style damped
    power iteration, teleport concentrated at the seed) — mirrors
    fog_spark.algos.pagerank.PPRMilli exactly in long arithmetic."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        f"v AS MATERIALIZED ({VERTS})",
        "d AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT id, CAST(CASE WHEN id = {seed} THEN 1000000 ELSE 0 END AS BIGINT) AS rank_milli FROM v)",
    ]
    for k in range(1, niters + 1):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT p.id, CAST(COALESCE(m.s, 0) "
            f"+ CASE WHEN p.id = {seed} THEN 150000 ELSE 0 END AS BIGINT) AS rank_milli "
            f"FROM r{k-1} p LEFT JOIN ("
            f"SELECT e.dst AS id, SUM((850 * r.rank_milli) // (1000 * d.outdeg)) AS s "
            f"FROM r{k-1} r JOIN d ON d.src = r.id JOIN e ON e.src = r.id GROUP BY e.dst"
            f") m ON m.id = p.id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, rank_milli FROM r{niters}"


def _spam_mass_sql(seeds: list[int], niters: int) -> str:
    """Unrolled spam mass (Gyongyi et al. VLDB 2006): uniform-teleport
    integer PageRank vs seed-set TrustRank rescaled to the same total
    mass — mirrors fog_spark.algos.spam.spam_mass_milli exactly in long
    arithmetic (DuckDB's // truncates toward zero like Spark's div for
    the operand signs here, including the possibly-negative pr-trust)."""
    k = len(seeds)
    seedlist = ", ".join(str(s) for s in seeds)
    init_tr = 1_000_000 // k
    tick_tr = 150_000 // k
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        f"v AS MATERIALIZED ({VERTS})",
        "d AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "p0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS r FROM v)",
        f"t0 AS MATERIALIZED (SELECT id, CAST(CASE WHEN id IN ({seedlist}) "
        f"THEN {init_tr} ELSE 0 END AS BIGINT) AS r FROM v)",
    ]
    for i in range(1, niters + 1):
        gather = (
            "SELECT e.dst AS id, SUM((850 * r.r) // (1000 * d.outdeg)) AS s "
            "FROM {src} r JOIN d ON d.src = r.id JOIN e ON e.src = r.id GROUP BY e.dst"
        )
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT p.id, CAST(COALESCE(m.s, 0) + 150000 AS BIGINT) AS r "
            f"FROM p{i-1} p LEFT JOIN ({gather.format(src=f'p{i-1}')}) m ON m.id = p.id)"
        )
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT p.id, CAST(COALESCE(m.s, 0) "
            f"+ CASE WHEN p.id IN ({seedlist}) THEN {tick_tr} ELSE 0 END AS BIGINT) AS r "
            f"FROM t{i-1} p LEFT JOIN ({gather.format(src=f't{i-1}')}) m ON m.id = p.id)"
        )
    ctes.append(
        f"j AS MATERIALIZED (SELECT p.id, p.r AS pr, t.r AS tr "
        f"FROM p{niters} p JOIN t{niters} t ON t.id = p.id)"
    )
    ctes.append("s AS MATERIALIZED (SELECT SUM(pr) AS s_pr, SUM(tr) AS s_tr FROM j)")
    ctes.append(
        "f AS MATERIALIZED (SELECT id, pr, CAST(CASE WHEN s_tr > 0 "
        "THEN (tr * s_pr) // s_tr ELSE 0 END AS BIGINT) AS trust FROM j CROSS JOIN s)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT id, pr AS pr_milli, trust AS trust_milli, "
        "CAST(((pr - trust) * 1000) // pr AS BIGINT) AS spam_permille FROM f"
    )


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled degree peel, exactly the bounded loop k_core() runs: per
    round drop vertices with undirected-simple degree < k and semi-join
    the edge set down; after the last round report (id, degree) of
    survivors with degree >= k. Spark's early fixpoint break returns the
    same result whenever the peel stabilizes within the bound."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "u0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst)",
    ]
    for i in range(1, rounds + 1):
        ctes += [
            f"deg{i} AS MATERIALIZED (SELECT id, COUNT(*) AS degree FROM ("
            f"SELECT a AS id FROM u{i-1} UNION ALL SELECT b FROM u{i-1}) GROUP BY id)",
            f"keep{i} AS MATERIALIZED (SELECT id FROM deg{i} WHERE degree >= {k})",
            f"u{i} AS MATERIALIZED (SELECT u.a, u.b FROM u{i-1} u "
            f"JOIN keep{i} ka ON ka.id = u.a JOIN keep{i} kb ON kb.id = u.b)",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, CAST(degree AS BIGINT) AS degree FROM (
  SELECT id, COUNT(*) AS degree FROM (
    SELECT a AS id FROM u{rounds} UNION ALL SELECT b FROM u{rounds}) GROUP BY id)
WHERE degree >= {k}"""
    )


def _frontier_plan_sql(niters: int, trap_min: int) -> str:
    """Oracle for the composed crawl-scheduler plan (frontier_plan gate
    query): the fixture's links are FORMULAIC in doc_id, so every stage
    is re-derived arithmetically — host multigraph (incl. the planted
    h9 /cal?d=N trap family) -> dense ids -> WeightedPageRankMilli ->
    page-level candidates (anti-joined against the crawled urls) ->
    the concrete h5 robots rules {Disallow /p/1*, Allow /p/13$} replayed
    as CASE logic (RFC 9309 longest-match resolution of exactly these
    two rules) -> sitemap seed union (same robots, anti-joined against
    crawled AND planned) -> trap-template subtraction (templates replay
    url_template's digit-collapse/value-drop arithmetically: /p/K ->
    host/p/N, /cal?d=K -> host/cal?d=)."""
    host = "'h' || CAST({} % 23 AS VARCHAR) || '.test'"
    prologue = (
        "d AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS did FROM documents)",
        "lk AS MATERIALIZED ("
        f"SELECT {host.format('did')} AS src_host, {host.format('(did * 7 + 1)')} AS dst_host FROM d "
        f"UNION ALL SELECT {host.format('did')}, {host.format('(did * 13 + 5)')} FROM d "
        f"UNION ALL SELECT {host.format('did')}, {host.format('(did * 7 + 1)')} FROM d "
        "WHERE did % 3 = 0 "
        f"UNION ALL SELECT {host.format('did')}, 'h9.test' FROM d)",
        "hc AS MATERIALIZED (SELECT src_host, dst_host, COUNT(*) AS n "
        "FROM lk GROUP BY src_host, dst_host)",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM "
        "(SELECT src_host AS host FROM hc UNION SELECT dst_host FROM hc))",
        "dim AS MATERIALIZED (SELECT host, "
        "CAST(ROW_NUMBER() OVER (ORDER BY host) - 1 AS BIGINT) AS id FROM hosts)",
    )
    edges_sql = (
        "SELECT s.id AS src, t.id AS dst, CAST(n * 1000 AS BIGINT) AS wm "
        "FROM hc JOIN dim s ON s.host = hc.src_host "
        "JOIN dim t ON t.host = hc.dst_host"
    )
    purl = (
        "'https://h' || CAST(({h}) % 23 AS VARCHAR) || '.test/p/' || CAST({p} AS VARCHAR)"
    )
    tail = f"""
, hr AS (SELECT dim.host AS host, r{niters}.rank_milli AS rank_milli
         FROM r{niters} JOIN dim ON dim.id = r{niters}.id),
crawled AS (SELECT {purl.format(h='did', p='did')} AS url FROM d),
cand0 AS (
  SELECT {purl.format(h='did * 7 + 1', p='did * 3')} AS url,
         {host.format('(did * 7 + 1)')} AS hst,
         '/p/' || CAST(did * 3 AS VARCHAR) AS pth FROM d
  UNION ALL
  SELECT {purl.format(h='did * 13 + 5', p='did * 5')},
         {host.format('(did * 13 + 5)')},
         '/p/' || CAST(did * 5 AS VARCHAR) FROM d
  UNION ALL
  SELECT {purl.format(h='did * 7 + 1', p='did * 3')},
         {host.format('(did * 7 + 1)')},
         '/p/' || CAST(did * 3 AS VARCHAR) FROM d WHERE did % 3 = 0
  UNION ALL
  SELECT 'https://h9.test/cal?d=' || CAST(did AS VARCHAR), 'h9.test',
         '/cal?d=' || CAST(did AS VARCHAR) FROM d
),
cand AS (SELECT url, hst, pth, COUNT(*) AS n_refs FROM cand0
         WHERE url NOT IN (SELECT url FROM crawled) GROUP BY url, hst, pth),
candr AS (SELECT * FROM cand
          WHERE NOT (hst = 'h5.test' AND pth LIKE '/p/1%' AND pth <> '/p/13')),
linkrows AS (SELECT c.url, c.hst AS host, CAST(c.n_refs AS BIGINT) AS n_refs,
                    CAST(COALESCE(hr.rank_milli, 0) AS BIGINT) AS host_rank_milli,
                    'link' AS via
             FROM candr c LEFT JOIN hr ON hr.host = c.hst),
sm AS (SELECT 'https://h2.test/p/' || CAST(k AS VARCHAR) AS url, 'h2.test' AS hst,
              '/p/' || CAST(k AS VARCHAR) AS pth FROM range(30) t(k)
       UNION ALL
       SELECT 'https://h5.test/p/' || CAST(k AS VARCHAR), 'h5.test',
              '/p/' || CAST(k AS VARCHAR) FROM range(10, 20) t(k)),
sm2 AS (SELECT DISTINCT url, hst, pth FROM sm
        WHERE url NOT IN (SELECT url FROM crawled)),
sm3 AS (SELECT * FROM sm2
        WHERE NOT (hst = 'h5.test' AND pth LIKE '/p/1%' AND pth <> '/p/13')),
seedrows AS (SELECT url, hst AS host, CAST(0 AS BIGINT) AS n_refs,
                    CAST(0 AS BIGINT) AS host_rank_milli, 'sitemap' AS via
             FROM sm3 WHERE url NOT IN (SELECT url FROM linkrows)),
plan0 AS (SELECT * FROM linkrows UNION ALL SELECT * FROM seedrows),
tpl AS (SELECT url, CASE WHEN url LIKE '%/cal?d=%' THEN host || '/cal?d='
                         ELSE host || '/p/N' END AS template FROM plan0),
trapped AS (SELECT template FROM tpl GROUP BY template
            HAVING COUNT(DISTINCT url) >= {trap_min}),
plan1 AS (SELECT p.url, p.host, p.n_refs, p.host_rank_milli, p.via
          FROM plan0 p JOIN tpl ON tpl.url = p.url
          WHERE tpl.template NOT IN (SELECT template FROM trapped)),
-- crawl_delays (h5: 2 s, h2: 0.5 s) + schedule_fetches replayed: the
-- i-th url of a host under the plan's priority order fetches at
-- i * delay_ms (default 1000 for hosts without a declared delay)
dly AS (SELECT 'h5.test' AS host, 2000 AS dms
        UNION ALL SELECT 'h2.test', 500),
sched AS (SELECT p.url,
       CAST((ROW_NUMBER() OVER (PARTITION BY p.host
             ORDER BY p.host_rank_milli DESC, p.n_refs DESC, p.url) - 1)
            * COALESCE(d.dms, 1000) AS BIGINT) AS fetch_offset_ms
       FROM plan1 p LEFT JOIN dly d ON d.host = p.host)
SELECT p.url, p.host, p.n_refs, p.host_rank_milli, p.via, s.fetch_offset_ms
FROM plan1 p JOIN sched s ON s.url = p.url"""
    return _wpagerank_milli_sql(niters, edges_sql=edges_sql, prologue=prologue, tail=tail)


def _msbfs_sql(seeds: list[int], rounds: int, tail: str) -> str:
    """Unrolled multi-source BFS — exactly algos.msbfs.multi_source_bfs:
    per round each (id, seed) keeps its min hop distance; bounded at
    ``rounds`` on both engines. $LAST in tail = the final level CTE."""
    seed_list = ", ".join(str(s) for s in seeds)
    ctes = [
        f"e0 AS MATERIALIZED ({EDGES})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0)",
        f"d0 AS MATERIALIZED (SELECT CAST(seed AS BIGINT) AS id, "
        f"CAST(seed AS BIGINT) AS seed, CAST(0 AS BIGINT) AS dist "
        f"FROM (SELECT unnest([{seed_list}]) AS seed))",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT id, seed, CAST(MIN(dist) AS BIGINT) AS dist FROM ("
            f"SELECT id, seed, dist FROM d{k-1} "
            f"UNION ALL SELECT e.dst, r.seed, r.dist + 1 FROM d{k-1} r JOIN e ON e.src = r.id"
            f") GROUP BY id, seed)"
        )
    return "WITH " + ",\n".join(ctes) + f"\n{tail.replace('$LAST', f'd{rounds}')}"


def _anchor_reach_sql(n_anchors: int, rounds: int) -> str:
    """Unrolled bitmask anchor-reachability fixpoint — mirrors
    algos.reach.anchor_reachability: anchors = n_anchors smallest
    (md5(id), id); per round every vertex ORs in its in-neighbors'
    masks. Exact longs on both engines."""
    ctes = [
        f"e0 AS MATERIALIZED ({EDGES})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0)",
        "v AS MATERIALIZED (SELECT src AS id FROM e0 UNION SELECT dst FROM e0)",
        "a AS MATERIALIZED (SELECT id, CAST(1::BIGINT << (rn - 1) AS BIGINT) AS bit FROM ("
        "SELECT id, ROW_NUMBER() OVER (ORDER BY md5(id::VARCHAR), id) AS rn FROM v)"
        f" WHERE rn <= {n_anchors})",
        "m0 AS MATERIALIZED (SELECT v.id, CAST(COALESCE(a.bit, 0) AS BIGINT) AS mask "
        "FROM v LEFT JOIN a ON a.id = v.id)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"m{k} AS MATERIALIZED (SELECT p.id, CAST(p.mask | COALESCE(g.m, 0) AS BIGINT) AS mask "
            f"FROM m{k-1} p LEFT JOIN ("
            f"SELECT e.dst AS id, bit_or(r.mask) AS m FROM m{k-1} r JOIN e ON e.src = r.id "
            f"GROUP BY e.dst) g ON g.id = p.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, mask, CAST(bit_count(mask) AS BIGINT) AS n_reach FROM m{rounds}"
    )


BM25_QUERIES = [
    "spark join order",
    "fast hash table scan",
    "stream window state",
    "customer query slow",
]


def _bm25_sql(queries: list[str], k: int, k1_micro=1_200_000, b_micro=750_000) -> str:
    """Integer BM25 twin — mirrors operators.index.bm25_topk_micro
    exactly (idf_milli = (1000*N) div df; tf/length quotient in micro;
    every div nonnegative so DuckDB // replays Spark div)."""
    from fog_spark.operators.index import tokenize_query

    vals = ", ".join(
        f"(CAST({qid} AS BIGINT), '{t}')"
        for qid, q in enumerate(queries)
        for t in tokenize_query(q)
    )
    # LEAST mirrors operators.index.TF_CAP (ANSI overflow guard)
    from fog_spark.operators.index import TF_CAP

    tfc = f"LEAST(tf, {TF_CAP})"
    term = (
        f"(((1000 * st.n) // df) * "
        f"((1000000 * ({tfc} * ({k1_micro} + 1000000))) // "
        f"(1000000 * {tfc} + ({k1_micro} * (1000000 - {b_micro} + "
        f"({b_micro} * ((1000000000 * dl) // st.avgdl_milli)) // 1000000)) // 1000000))"
        f") // 1000"
    )
    return f"""
WITH d AS MATERIALIZED (SELECT doc_id, {TOKS} AS toks FROM documents),
dl AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              GREATEST(1, (1000 * CAST(COALESCE(SUM(dl), 0) AS BIGINT))
                          // CAST(COUNT(*) AS BIGINT)) AS avgdl_milli FROM dl),
p AS MATERIALIZED (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
     FROM (SELECT doc_id, unnest(toks) AS t FROM d) GROUP BY 1, 2),
q AS (SELECT * FROM (VALUES {vals}) AS v(query_id, term)),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p
        WHERE term IN (SELECT term FROM q) GROUP BY 1),
sc AS (SELECT q.query_id, p.doc_id, CAST(SUM({term}) AS BIGINT) AS score_micro
       FROM p JOIN q USING (term) JOIN dft USING (term) JOIN dl USING (doc_id), st
       GROUP BY 1, 2)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
       doc_id, score_micro
FROM sc
QUALIFY rank <= {k}"""


def _redirect_sql(max_hops: int) -> str:
    """Sequential bounded redirect-chain replay — mirrors
    fog_spark.operators.redirects.resolve_redirects over the string-id
    map (min VARCHAR target per source, self-redirects dropped): step
    once per CTE up to max_hops total hops; done rows carry through.
    Agreement with Spark's pointer doubling pins the doubling's
    exact-hop contract (hops doubles only while live, so a power-of-two
    cap makes both outcomes hop-exact)."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "m AS MATERIALIZED (SELECT CAST(src AS VARCHAR) AS url, "
        "MIN(CAST(dst AS VARCHAR)) AS target FROM e WHERE src <> dst GROUP BY 1)",
        # tdone = the row's target has no outgoing redirect
        "md AS MATERIALIZED (SELECT a.url, a.target, (b.url IS NULL) AS tdone "
        "FROM m a LEFT JOIN m b ON b.url = a.target)",
        "s1 AS (SELECT url, target, CAST(1 AS BIGINT) AS hops, tdone AS done FROM md)",
    ]
    for k in range(2, max_hops + 1):
        ctes.append(
            f"s{k} AS (SELECT s.url, "
            "CASE WHEN s.done THEN s.target ELSE t.target END AS target, "
            "CASE WHEN s.done THEN s.hops ELSE s.hops + 1 END AS hops, "
            "CASE WHEN s.done THEN TRUE ELSE t.tdone END AS done "
            f"FROM s{k - 1} s LEFT JOIN md t ON t.url = s.target)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT url, target AS final_url, hops, done AS resolved FROM s{max_hops}"
    )


def _walks_sql(walk_len: int) -> str:
    """Unrolled deterministic random-walk corpus — mirrors
    fog_spark.operators.walks.random_walks(hash_fn='md5') exactly: step
    index = first 12 md5 hex chars of 'walk_id:t:cur' as a 48-bit int,
    mod out-degree, over ascending-dst neighbors; dangling absorbs."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "adj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx, "
        "COUNT(*) OVER (PARTITION BY src) AS deg FROM e)",
        "w0 AS MATERIALIZED (SELECT DISTINCT src AS walk_id, src AS cur FROM e)",
    ]
    for t in range(1, walk_len + 1):
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT w.walk_id, COALESCE(a.dst, w.cur) AS cur "
            f"FROM w{t-1} w LEFT JOIN adj a ON a.src = w.cur AND a.idx = "
            f"CAST('0x' || substr(md5(w.walk_id::VARCHAR || ':{t}:' || w.cur::VARCHAR), "
            f"1, 12) AS BIGINT) % a.deg)"
        )
    steps = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS vertex FROM w{t}"
        for t in range(walk_len + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + steps


def _hyperball_sql(m: int, rounds: int) -> str:
    """Unrolled HyperBall HLL sketches — mirrors
    fog_spark.algos.hyperball.hyperball_sketches(hash_fn='md5') exactly
    in long register format: h = md5_48(id), reg = h % m,
    rho = rho_max - bitlen(h // m); each round register-wise MAX along
    out-edges; sum2k = sum_j 2^(rho_max - M_j) with absent registers
    contributing 2^rho_max (M_j = 0). Present rows always have rho >= 1,
    so zeros = m - count(present registers)."""
    b = m.bit_length() - 1
    rho_max = 48 - b + 1
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "ee AS MATERIALIZED (SELECT DISTINCT src, dst FROM e)",
        f"v AS MATERIALIZED ({VERTS})",
        "h AS MATERIALIZED (SELECT id, "
        "CAST('0x' || substr(md5(id::VARCHAR), 1, 12) AS BIGINT) AS h FROM v)",
        f"s0 AS MATERIALIZED (SELECT id, CAST(h % {m} AS INT) AS reg, "
        f"CAST({rho_max} - (CASE WHEN h // {m} = 0 THEN 0 ELSE "
        f"length(bin(h // {m})) END) AS INT) AS rho FROM h)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"s{t} AS MATERIALIZED (SELECT id, reg, MAX(rho) AS rho FROM ("
            f"SELECT id, reg, rho FROM s{t-1} "
            f"UNION ALL "
            f"SELECT ee.dst AS id, s.reg, s.rho FROM s{t-1} s "
            f"JOIN ee ON ee.src = s.id) GROUP BY id, reg)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, "
        f"CAST(SUM(1::BIGINT << ({rho_max} - rho)) + "
        f"({m} - COUNT(*)) * (1::BIGINT << {rho_max}) AS BIGINT) AS sum2k, "
        f"CAST({m} - COUNT(*) AS BIGINT) AS zeros "
        f"FROM s{rounds} GROUP BY id"
    )


def _spcount_sql(seeds: list[int], rounds: int) -> str:
    """Unrolled MS-BFS with shortest-path counting — mirrors
    algos.msbfs.shortest_path_counts exactly: layer/settled split (the
    union-min trick used by _msbfs_sql can't carry sigma), sigma of a
    new vertex = sum of frontier parents' sigmas."""
    seed_list = ", ".join(str(s) for s in seeds)
    ctes = [
        f"e0 AS MATERIALIZED ({EDGES})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0)",
        f"l0 AS MATERIALIZED (SELECT CAST(seed AS BIGINT) AS id, "
        f"CAST(seed AS BIGINT) AS seed, CAST(0 AS BIGINT) AS dist, "
        f"CAST(1 AS BIGINT) AS sigma "
        f"FROM (SELECT unnest([{seed_list}]) AS seed))",
        "s0 AS MATERIALIZED (SELECT * FROM l0)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"l{k} AS MATERIALIZED (SELECT g.id, g.seed, g.dist, g.sigma FROM ("
            f"SELECT e.dst AS id, r.seed, CAST(MIN(r.dist) + 1 AS BIGINT) AS dist, "
            f"CAST(SUM(r.sigma) AS BIGINT) AS sigma "
            f"FROM l{k-1} r JOIN e ON e.src = r.id GROUP BY e.dst, r.seed) g "
            f"LEFT JOIN s{k-1} s ON s.id = g.id AND s.seed = g.seed "
            f"WHERE s.id IS NULL)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT * FROM s{k-1} UNION ALL SELECT * FROM l{k})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, seed, dist, sigma FROM s{rounds}"
    )


def _spcont_sql(seeds: list[int], rounds: int) -> str:
    """Unrolled Brandes integer pair — mirrors
    algos.msbfs.sp_continuations: the _spcount_sql forward pass, then a
    static backward unroll t_d = 1 + sum of t_{d+1} over SP-DAG
    successors; layers past the actual eccentricity are empty, so the
    static depth works for any dmax <= rounds."""
    fwd = _spcount_sql(seeds, rounds)
    head, _, _tail = fwd.rpartition("\nSELECT")
    ctes = [head + f",\nsp AS MATERIALIZED (SELECT * FROM s{rounds})"]
    ctes.append(
        f"t{rounds} AS MATERIALIZED (SELECT id, seed, CAST(1 AS BIGINT) AS t "
        f"FROM sp WHERE dist = {rounds})"
    )
    for d in range(rounds - 1, -1, -1):
        ctes.append(
            f"t{d} AS MATERIALIZED (SELECT l.id, l.seed, "
            f"CAST(1 + COALESCE(x.ts, 0) AS BIGINT) AS t "
            f"FROM (SELECT id, seed FROM sp WHERE dist = {d}) l "
            f"LEFT JOIN (SELECT l2.id, l2.seed, SUM(w.t) AS ts "
            f"FROM (SELECT id, seed FROM sp WHERE dist = {d}) l2 "
            f"JOIN e ON e.src = l2.id "
            f"JOIN t{d+1} w ON w.id = e.dst AND w.seed = l2.seed "
            f"GROUP BY l2.id, l2.seed) x ON x.id = l.id AND x.seed = l.seed)"
        )
    allt = " UNION ALL ".join(
        f"SELECT * FROM t{d}" for d in range(0, rounds + 1)
    )
    ctes.append(f"tt AS MATERIALIZED ({allt})")
    return (
        ",\n".join(ctes)
        + "\nSELECT sp.id, sp.seed, sp.dist, sp.sigma, tt.t AS t_cont "
        "FROM sp JOIN tt ON tt.id = sp.id AND tt.seed = sp.seed"
    )


def _hits_sql(iters: int) -> str:
    """Unrolled integer-milli max-normalized HITS — mirrors
    fog_spark.algos.hits.hits_milli exactly (`div`/`//` integer
    division, operands non-negative; multi-edges count)."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        f"v AS MATERIALIZED ({VERTS})",
        "h0 AS MATERIALIZED (SELECT id, CAST(1000 AS BIGINT) AS s FROM v)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"ar{t} AS MATERIALIZED (SELECT v.id, COALESCE(x.s, 0) AS s FROM v "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(h.s) AS s FROM e "
            f"JOIN h{t-1} h ON h.id = e.src GROUP BY e.dst) x ON x.id = v.id)"
        )
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT id, CAST(CASE WHEN mx > 0 THEN "
            f"(s * 1000) // mx ELSE 0 END AS BIGINT) AS s "
            f"FROM ar{t}, (SELECT MAX(s) AS mx FROM ar{t}))"
        )
        ctes.append(
            f"hr{t} AS MATERIALIZED (SELECT v.id, COALESCE(x.s, 0) AS s FROM v "
            f"LEFT JOIN (SELECT e.src AS id, SUM(a.s) AS s FROM e "
            f"JOIN a{t} a ON a.id = e.dst GROUP BY e.src) x ON x.id = v.id)"
        )
        ctes.append(
            f"h{t} AS MATERIALIZED (SELECT id, CAST(CASE WHEN mx > 0 THEN "
            f"(s * 1000) // mx ELSE 0 END AS BIGINT) AS s "
            f"FROM hr{t}, (SELECT MAX(s) AS mx FROM hr{t}))"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT a.id, a.s AS auth_milli, h.s AS hub_milli "
        f"FROM a{iters} a JOIN h{iters} h ON h.id = a.id"
    )


def _hits_salsa_sql(iters: int) -> str:
    """Unrolled integer-milli HITS + SALSA in one statement — mirrors
    hits_milli JOIN salsa_milli (per-edge `//` degree normalization for
    SALSA, raw sums for HITS; both max-normalized; multi-edges count)."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        f"v AS MATERIALIZED ({VERTS})",
        "od AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM e GROUP BY src)",
        "ind AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS ind FROM e GROUP BY dst)",
        "h0 AS MATERIALIZED (SELECT id, CAST(1000 AS BIGINT) AS s FROM v)",
        "sh0 AS MATERIALIZED (SELECT id, CAST(1000 AS BIGINT) AS s FROM v)",
    ]
    for t in range(1, iters + 1):
        # HITS half-steps (raw sums)
        ctes.append(
            f"ar{t} AS MATERIALIZED (SELECT v.id, COALESCE(x.s, 0) AS s FROM v "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(h.s) AS s FROM e "
            f"JOIN h{t-1} h ON h.id = e.src GROUP BY e.dst) x ON x.id = v.id)"
        )
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT id, CAST(CASE WHEN mx > 0 THEN "
            f"(s * 1000) // mx ELSE 0 END AS BIGINT) AS s "
            f"FROM ar{t}, (SELECT MAX(s) AS mx FROM ar{t}))"
        )
        ctes.append(
            f"hr{t} AS MATERIALIZED (SELECT v.id, COALESCE(x.s, 0) AS s FROM v "
            f"LEFT JOIN (SELECT e.src AS id, SUM(a.s) AS s FROM e "
            f"JOIN a{t} a ON a.id = e.dst GROUP BY e.src) x ON x.id = v.id)"
        )
        ctes.append(
            f"h{t} AS MATERIALIZED (SELECT id, CAST(CASE WHEN mx > 0 THEN "
            f"(s * 1000) // mx ELSE 0 END AS BIGINT) AS s "
            f"FROM hr{t}, (SELECT MAX(s) AS mx FROM hr{t}))"
        )
        # SALSA half-steps (per-edge integer degree quotients)
        ctes.append(
            f"sar{t} AS MATERIALIZED (SELECT v.id, COALESCE(x.s, 0) AS s FROM v "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(h.s // od.od) AS s FROM e "
            f"JOIN sh{t-1} h ON h.id = e.src JOIN od ON od.id = e.src "
            f"GROUP BY e.dst) x ON x.id = v.id)"
        )
        ctes.append(
            f"sa{t} AS MATERIALIZED (SELECT id, CAST(CASE WHEN mx > 0 THEN "
            f"(s * 1000) // mx ELSE 0 END AS BIGINT) AS s "
            f"FROM sar{t}, (SELECT MAX(s) AS mx FROM sar{t}))"
        )
        ctes.append(
            f"shr{t} AS MATERIALIZED (SELECT v.id, COALESCE(x.s, 0) AS s FROM v "
            f"LEFT JOIN (SELECT e.src AS id, SUM(a.s // ind.ind) AS s FROM e "
            f"JOIN sa{t} a ON a.id = e.dst JOIN ind ON ind.id = e.dst "
            f"GROUP BY e.src) x ON x.id = v.id)"
        )
        ctes.append(
            f"sh{t} AS MATERIALIZED (SELECT id, CAST(CASE WHEN mx > 0 THEN "
            f"(s * 1000) // mx ELSE 0 END AS BIGINT) AS s "
            f"FROM shr{t}, (SELECT MAX(s) AS mx FROM shr{t}))"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT a.id, a.s AS auth_milli, h.s AS hub_milli, "
        f"sa.s AS salsa_auth_milli, sh.s AS salsa_hub_milli "
        f"FROM a{iters} a JOIN h{iters} h ON h.id = a.id "
        f"JOIN sa{iters} sa ON sa.id = a.id "
        f"JOIN sh{iters} sh ON sh.id = a.id"
    )


def _co_project_sql(max_dst_degree: int, min_shared: int) -> str:
    """Mirrors fog_spark.operators.projection.co_project: src pairs
    (a < b) sharing dsts, dsts above the degree cap excluded."""
    return f"""
WITH e AS MATERIALIZED ({EDGES}),
d AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
kept AS MATERIALIZED (SELECT dst FROM d GROUP BY dst
  HAVING COUNT(*) <= {max_dst_degree}),
ek AS MATERIALIZED (SELECT d.src, d.dst FROM d JOIN kept k ON k.dst = d.dst)
SELECT l.src AS a, r.src AS b, CAST(COUNT(*) AS BIGINT) AS shared
FROM ek l JOIN ek r ON r.dst = l.dst AND l.src < r.src
GROUP BY l.src, r.src
HAVING COUNT(*) >= {min_shared}
"""


def _neighbor_sample_sql(k: int) -> str:
    """Mirrors fog_spark.operators.sampling.sample_neighbors(hash_fn='md5'):
    k smallest (md5_48(src:dst), dst) per src over distinct neighbors."""
    return f"""
WITH e AS MATERIALIZED ({EDGES}),
d AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
r AS (SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY
  CAST('0x' || substr(md5(src::VARCHAR || ':' || dst::VARCHAR), 1, 12) AS BIGINT),
  dst) AS rn FROM d)
SELECT src, dst FROM r WHERE rn <= {k}
"""


def _ktruss_sql(k: int, max_rounds: int) -> str:
    """Unrolled k-truss peel — mirrors fog_spark.algos.ktruss.k_truss
    exactly: per round, per-edge support = |N(a) & N(b)| over the
    surviving canonical edge set via a wedge join, keep support >= k-2.
    Inner-join support is safe because k >= 3 (zero-triangle edges must
    drop anyway)."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "u0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst)",
    ]
    for r in range(1, max_rounds + 1):
        ctes.append(
            f"sym{r} AS MATERIALIZED (SELECT a AS u, b AS w FROM u{r-1} "
            f"UNION ALL SELECT b, a FROM u{r-1})"
        )
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT x.a, x.b FROM u{r-1} x "
            f"JOIN (SELECT x.a, x.b, COUNT(*) AS supp FROM u{r-1} x "
            f"JOIN sym{r} p ON p.u = x.a JOIN sym{r} q ON q.u = x.b "
            f"AND q.w = p.w GROUP BY x.a, x.b) s "
            f"ON s.a = x.a AND s.b = x.b AND s.supp >= {k - 2})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT a, b FROM u{max_rounds}"
    )


def _mis_sql(max_rounds: int) -> str:
    """Unrolled Luby MIS — mirrors
    fog_spark.algos.mis.maximal_independent_set(hash_fn='md5') exactly:
    round-r priority of v is (md5_48('r:v'), v); a vertex with no
    strictly-better undecided neighbor joins the MIS, its undecided
    neighbors drop out; symmetric simple graph."""
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM e WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM e WHERE src <> dst))",
        f"v AS MATERIALIZED ({VERTS})",
        "u0 AS MATERIALIZED (SELECT id FROM v)",
    ]
    for r in range(1, max_rounds + 1):
        ctes.append(
            f"pr{r} AS MATERIALIZED (SELECT id, "
            f"CAST('0x' || substr(md5('{r}:' || id::VARCHAR), 1, 12) AS BIGINT) "
            f"AS h FROM u{r-1})"
        )
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT p.id FROM pr{r} p WHERE NOT EXISTS ("
            f"SELECT 1 FROM und n JOIN pr{r} q ON q.id = n.dst "
            f"WHERE n.src = p.id AND (q.h < p.h OR (q.h = p.h AND q.id < p.id))))"
        )
        ctes.append(
            f"l{r} AS MATERIALIZED (SELECT DISTINCT n.dst AS id "
            f"FROM und n JOIN w{r} w ON w.id = n.src "
            f"JOIN u{r-1} uu ON uu.id = n.dst "
            f"WHERE n.dst NOT IN (SELECT id FROM w{r}))"
        )
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT id FROM u{r-1} "
            f"WHERE id NOT IN (SELECT id FROM w{r}) "
            f"AND id NOT IN (SELECT id FROM l{r}))"
        )
    mis = " UNION ".join(f"SELECT id FROM w{r}" for r in range(1, max_rounds + 1))
    non = " UNION ".join(f"SELECT id FROM l{r}" for r in range(1, max_rounds + 1))
    ctes.append(f"mis AS MATERIALIZED ({mis})")
    ctes.append(f"non AS MATERIALIZED ({non})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT v.id, CASE WHEN m.id IS NOT NULL THEN TRUE "
        "WHEN x.id IS NOT NULL THEN FALSE ELSE CAST(NULL AS BOOLEAN) END AS in_mis "
        "FROM v LEFT JOIN mis m ON m.id = v.id LEFT JOIN non x ON x.id = v.id"
    )


def _node2vec_sql(walk_len: int, p=4, q=0.25, trials: int = 3) -> str:
    """Unrolled node2vec rejection-sampling corpus — mirrors
    fog_spark.operators.node2vec.node2vec_walks(hash_fn='md5') exactly:
    per trial, pick idx = md5_48('w:t:r:cur') % outdeg over ascending-dst
    neighbors, accept iff md5_48('a:w:t:r:cur') % 2^32 * den < num * 2^32
    with the exact class rational (return / out-neighbor-of-prev / far);
    first accepted trial wins, else trial 1's candidate; dangling absorb.
    Step 1 (prev NULL) is uniform."""
    from fog_spark.operators.node2vec import _ratios

    (ret_n, ret_d), (nb_n, nb_d), (far_n, far_d) = _ratios(p, q)
    U32 = 1 << 32
    vals = ", ".join(f"({r})" for r in range(1, trials + 1))
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "adj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx, "
        "COUNT(*) OVER (PARTITION BY src) AS deg FROM e)",
        "nbset AS MATERIALIZED (SELECT DISTINCT src, dst FROM e)",
        "w0 AS MATERIALIZED (SELECT DISTINCT src AS walk_id, "
        "CAST(NULL AS BIGINT) AS prev, src AS cur FROM e)",
    ]
    for t in range(1, walk_len + 1):
        key = f"w.walk_id::VARCHAR || ':{t}:' || r.r::VARCHAR || ':' || w.cur::VARCHAR"
        u32 = f"(CAST('0x' || substr(md5('a:' || {key}), 1, 12) AS BIGINT) % {U32})"
        ctes.append(
            f"t{t} AS MATERIALIZED (SELECT w.walk_id, w.cur, r.r, a.dst AS cand, "
            f"CASE WHEN a.dst IS NULL THEN FALSE "
            f"WHEN w.prev IS NULL THEN TRUE "
            f"WHEN a.dst = w.prev THEN {u32} * {ret_d} < {ret_n} * {U32} "
            f"WHEN nb.src IS NOT NULL THEN {u32} * {nb_d} < {nb_n} * {U32} "
            f"ELSE {u32} * {far_d} < {far_n} * {U32} END AS acc "
            f"FROM w{t-1} w "
            f"CROSS JOIN (VALUES {vals}) r(r) "
            f"LEFT JOIN adj a ON a.src = w.cur AND a.idx = "
            f"CAST('0x' || substr(md5({key}), 1, 12) AS BIGINT) % a.deg "
            f"LEFT JOIN nbset nb ON nb.src = w.prev AND nb.dst = a.dst)"
        )
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT walk_id, cur AS prev, "
            f"COALESCE(arg_min(cand, CASE WHEN acc THEN r ELSE {trials} + r END), cur) "
            f"AS cur FROM t{t} GROUP BY walk_id, cur)"
        )
    steps = "\nUNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS vertex FROM w{t}"
        for t in range(walk_len + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + steps


def _lpa_modularity_sql(rounds: int) -> str:
    """Integer modularity (floor(1000*(Q+1)), m) of the LPA labeling —
    mirrors fog_spark.algos.modularity.modularity_plus1_milli over the
    canonical undirected simple graph; non-negative dividend so DuckDB
    `//` (floor) and Spark `div` (truncate) agree."""
    ctes = _lpa_ctes(rounds) + [
        "cu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst)",
        "mm AS MATERIALIZED (SELECT COUNT(*) AS m FROM cu)",
        "degs AS MATERIALIZED (SELECT id, COUNT(*) AS d FROM ("
        "SELECT a AS id FROM cu UNION ALL SELECT b FROM cu) GROUP BY id)",
        f"lab AS MATERIALIZED (SELECT id, label FROM l{rounds})",
        "ec AS MATERIALIZED (SELECT l1.label, COUNT(*) AS e_c FROM cu u "
        "JOIN lab l1 ON l1.id = u.a JOIN lab l2 ON l2.id = u.b "
        "AND l2.label = l1.label GROUP BY l1.label)",
        "dc AS MATERIALIZED (SELECT l.label, SUM(d.d) AS d_c FROM lab l "
        "JOIN degs d ON d.id = l.id GROUP BY l.label)",
        "qn AS MATERIALIZED (SELECT SUM(4 * mm.m * COALESCE(ec.e_c, 0) "
        "- dc.d_c * dc.d_c) AS qnum, MAX(mm.m) AS m "
        "FROM dc LEFT JOIN ec ON ec.label = dc.label CROSS JOIN mm)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT CAST(((qnum + 4 * m * m) * 1000) // (4 * m * m) AS BIGINT) "
        "AS q_plus1_milli, CAST(m AS BIGINT) AS m_edges FROM qn"
    )


def _lpa_labels_modularity_sql(rounds: int) -> str:
    """Per-vertex LPA labels cross-joined with the labeling's integer
    modularity row — the one-slot merge of the former lpa5_labels and
    lpa5_modularity_milli gate queries (both value-hash-checked)."""
    body = _lpa_modularity_sql(rounds)
    head, _, _tail = body.rpartition("\nSELECT")
    return (
        head
        + f"\nSELECT l.id, l.label, "
        "CAST(((qn.qnum + 4 * qn.m * qn.m) * 1000) // (4 * qn.m * qn.m) AS BIGINT) "
        "AS q_plus1_milli, CAST(qn.m AS BIGINT) AS m_edges "
        f"FROM l{rounds} l CROSS JOIN qn"
    )


def _lpa_ctes(rounds: int) -> list[str]:
    ctes = [
        f"e AS MATERIALIZED ({EDGES})",
        "und AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM e WHERE src <> dst "
        "UNION ALL SELECT dst, src FROM e WHERE src <> dst))",
        f"v AS MATERIALIZED ({VERTS})",
        "l0 AS MATERIALIZED (SELECT id, CAST(id AS BIGINT) AS label FROM v)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"l{k} AS MATERIALIZED (SELECT base.id, CAST(COALESCE(w.new_label, base.label) AS BIGINT) AS label "
            f"FROM l{k-1} base LEFT JOIN ("
            f"SELECT dst, new_label FROM ("
            f"SELECT c.dst, c.label AS new_label, "
            f"ROW_NUMBER() OVER (PARTITION BY c.dst ORDER BY c.cnt DESC, c.label ASC) AS rn "
            f"FROM (SELECT u.dst, p.label, COUNT(*) AS cnt FROM und u "
            f"JOIN l{k-1} p ON p.id = u.src GROUP BY u.dst, p.label) c"
            f") rr WHERE rn = 1) w ON w.dst = base.id)"
        )
    return ctes


# ------------------------------------------------------------ spark helpers

_STATE_CACHE: dict = {}


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fog_spark.sources.tables import edges_from_orders

    return edges_from_orders(spark, sf_dir)


def _edges_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fog_spark.hashing import pmod

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        pmod(F.col("o_orderkey").cast("long"), F.lit(151)).alias("dst"),
        (1000 + pmod(F.col("o_orderkey") * 7 + F.col("o_custkey") * 13, F.lit(9000)))
        .cast("double")
        .alias("weight"),
    )


def _edges_hub_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of HUB_EDGES_MILLI (planted >hub_cap hub at vertex 0)."""
    from fog_spark.hashing import pmod

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hub = orders.select(
        F.lit(0).cast("long").alias("src"),
        (1000 + pmod(F.col("o_orderkey").cast("long"), F.lit(300))).alias("dst"),
        (1000 + pmod(F.col("o_orderkey") * 11, F.lit(4000)))
        .cast("double")
        .alias("weight"),
    )
    return _edges_milli(spark, sf_dir).unionByName(hub)


def _tune_session(spark: SparkSession) -> None:
    """Gate-scale session tune, idempotent and value-safe (no query here
    depends on partition count — dense ids use range-partition + global
    prefix sum). The driver owns the SparkSession; if it came up with
    Spark's 200-partition default, every tiny gate shuffle pays ~6x task
    scheduling overhead, and without AQE nothing coalesces them."""
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # the driver owns the session: pin the tz the oracles assume, or a
        # non-UTC session shifts F.to_date day boundaries relative to
        # DuckDB's tz-naive CAST(ts AS DATE) (event_daily_windows)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        if int(spark.conf.get("spark.sql.shuffle.partitions")) > 64:
            spark.conf.set("spark.sql.shuffle.partitions", "64")
    except Exception:
        pass  # a locked-down session is fine too — just slower


def _msbfs_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # msbfs4 and harmonic4_milli share one traversal (gate-runtime budget)
    key = ("msbfs4", sf_dir)
    if key not in _STATE_CACHE:
        from fog_spark.algos.msbfs import multi_source_bfs

        _STATE_CACHE[key] = multi_source_bfs(
            _edges(spark, sf_dir), [0, 1, 2, 3], max_rounds=16
        )
    return _STATE_CACHE[key]


def _engine(spark: SparkSession):
    from fog_spark.plans.engine import ScatterGatherEngine

    return ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)


def _pagerank_milli_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("prm", sf_dir)
    if key not in _STATE_CACHE:
        from fog_spark.algos import FogPageRankMilli

        res = _engine(spark).run(FogPageRankMilli(niters=10), _edges(spark, sf_dir))
        _STATE_CACHE[key] = res.state.select("id", "rank_milli")
    return _STATE_CACHE[key]


def _cc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three queries() entries share one engine run (gate-runtime budget)
    key = ("cc", sf_dir)
    if key not in _STATE_CACHE:
        from fog_spark.algos import ConnectedComponents

        res = _engine(spark).run(ConnectedComponents(), _edges(spark, sf_dir))
        _STATE_CACHE[key] = res.state.select("id", "component")
    return _STATE_CACHE[key]


def _scc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("scc", sf_dir)
    if key not in _STATE_CACHE:
        from fog_spark.algos import scc

        _STATE_CACHE[key] = scc(_edges(spark, sf_dir))
    return _STATE_CACHE[key]


def _msf_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("msf", sf_dir)
    if key not in _STATE_CACHE:
        from fog_spark.algos import msf

        _STATE_CACHE[key] = msf(_edges_milli(spark, sf_dir))
    return _STATE_CACHE[key]


def _text_graph_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the orders-derived edge table as SNAP-style text
    (edge-list + adj-list) once per sf; the scan queries then exercise
    the C1/C2 text ingest path end-to-end against the SQL edge oracle."""
    import tempfile

    from fog_spark.sources.edgelist import write_adjlist, write_edgelist

    key = ("textgraph", sf_dir)
    if key not in _STATE_CACHE:
        from fog_spark.sources.fogbin import write_fog_binary

        d = tempfile.mkdtemp(prefix="fog_spark_textgraph_")
        e = _edges(spark, sf_dir).select("src", "dst")
        write_edgelist(e, f"{d}/edges")
        write_adjlist(e, f"{d}/adj")
        # the converter's binary CSR layout (fixture-writer twin) —
        # exercises the C5-analog binary ingest path alongside the text
        write_fog_binary(e, f"{d}/fog", edge_type=2)
        _STATE_CACHE[key] = d
    return _STATE_CACHE[key]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ------------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: orders-derived link graph -> 10 engine iterations of the
    FOG PageRank recurrence (integer milli twin) with per-iteration
    checkpoints + lineage -> top-20 ranks."""
    import tempfile

    from fog_spark.algos import FogPageRankMilli
    from fog_spark.plans.engine import ScatterGatherEngine

    _tune_session(spark)
    ckpt = tempfile.mkdtemp(prefix="fog_spark_entry_")
    eng = ScatterGatherEngine(spark, checkpoint_dir=ckpt)
    res = eng.run(FogPageRankMilli(niters=10), _edges(spark, SF_SMOKE), run_id="entry")
    return (
        res.state.select("id", "rank_milli")
        .orderBy(F.col("rank_milli").desc(), F.col("id"))
        .limit(20)
    )


# ----------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fog_spark import graph as G
    from fog_spark.algos import (
        BFS,
        SSSP,
        ConnectedComponents,
        LabelPropagation,
        spmv,
    )
    from fog_spark.functions.extract import extract_text_col
    from fog_spark.operators.dedup import exact_dedup, minhash_md5_candidates, ngram_jaccard_pairs
    from fog_spark.operators.similarity import cosine_topk
    from fog_spark.operators.text import (
        doc_fingerprint_portable,
        lang_id,
        quality_features,
    )

    def text_scans(spark, sf):
        # C1+C2+C5(binary) in one gate slot: SNAP edge-list, "src n
        # dst1..dstn" adjacency-list text ingest AND the converter's
        # binary CSR (.desc/.index/.edge — 1-based offsets, unused slot
        # 0) as write+read roundtrips of the same edge multiset the SQL
        # oracle defines, tagged by format so all three parse paths stay
        # hash-checked
        from fog_spark.sources.edgelist import read_adjlist, read_edgelist
        from fog_spark.sources.fogbin import read_fog_graph

        d = _text_graph_dir(spark, sf)
        e = read_edgelist(spark, f"{d}/edges").select(
            F.lit("edge").alias("fmt"), "src", "dst"
        )
        a = read_adjlist(spark, f"{d}/adj").select(
            F.lit("adj").alias("fmt"), "src", "dst"
        )
        g = read_fog_graph(spark, f"{d}/fog.desc").select(
            F.lit("fog").alias("fmt"), "src", "dst"
        )
        return e.unionByName(a).unionByName(g)

    def graph_stats(spark, sf):
        # .desc stats + the round-4 census columns (reciprocity + the
        # integer assortativity sums) + the incremental triangle delta
        # in the same 1-row slot — gate-cap merging; each column
        # hash-fails independently. The delta runs Spark's delta-LOCAL
        # inclusion-exclusion (algos/triangles.triangle_delta) against a
        # deterministic old = edges with (src+dst)%19 != 0 subset, while
        # the oracle RECOUNTS both graphs and their intersection — so a
        # hash match proves the incremental path equals full recounts
        # cross-engine.
        from fog_spark.algos.triangles import triangle_delta

        s = G.graph_stats(_edges(spark, sf))
        base = spark.createDataFrame(
            [(s["min_vertex_id"], s["max_vertex_id"], s["num_edges"], s["max_out_edges"])],
            "min_vertex_id long, max_vertex_id long, num_edges long, max_out_edges long",
        )
        e = _edges(spark, sf)
        old = e.where((F.col("src") + F.col("dst")) % 19 != 0)
        td = triangle_delta(old, e).select(
            F.col("n_added").alias("td_added"),
            F.col("n_removed").alias("td_removed"),
            "tri_gained",
            "tri_lost",
            F.col("delta").alias("tri_delta"),
        )
        return base.crossJoin(F.broadcast(G.census_stats(e))).crossJoin(
            F.broadcast(td)
        )

    def adjacency_csr(spark, sf):
        adj = G.build_adjacency(_edges(spark, sf), hub_cap=None)
        return adj.select(
            "src",
            "outdeg",
            F.array_join(
                F.transform(F.sort_array("dsts"), lambda d: d.cast("string")), ","
            ).alias("dsts_csv"),
        )

    def in_adjacency_csr(spark, sf):
        adj = G.build_in_adjacency(_edges(spark, sf), hub_cap=None)
        return adj.select(
            "dst",
            "indeg",
            F.array_join(
                F.transform(F.sort_array("srcs"), lambda d: d.cast("string")), ","
            ).alias("srcs_csv"),
        )

    def spmv_milli(spark, sf):
        # one slot, both SpMV paths: y = A^T 1 (no x join) and
        # y = A^T x with x(id) = id % 97 + 1 — exercises the x-vector join
        # (spmv.hpp:47-59); all-long arithmetic so the oracle is hash-exact.
        e = _edges_milli(spark, sf)
        y1 = spmv(e).select("id", F.col("y").cast("long").alias("y_milli"))
        x = (
            e.select(F.col("src").alias("id")).distinct()
            .select("id", (F.col("id") % 97 + 1).cast("double").alias("x"))
        )
        yx = spmv(e, x).select("id", F.col("y").cast("long").alias("yx_milli"))
        return y1.join(yx, "id")

    def pagerank_fog10_milli(spark, sf):
        return _pagerank_milli_state(spark, sf)

    def connected_components(spark, sf):
        return _cc_state(spark, sf)

    def bfs_levels(spark, sf):
        # max_iters=100 pins the iteration bound to the oracle's
        # `r.lvl < 100` recursion guard: both sides emit levels <= 100,
        # so graphs with eccentricity > 100 from the root still agree
        # (tests/test_algos.py proves it on a 150-vertex path).
        res = _engine(spark).run(BFS(root=0), _edges(spark, sf), max_iters=100)
        return res.state.where(F.col("level") < (1 << 62)).select("id", "level")

    def sssp16_milli(spark, sf):
        # gate-cap merging (round 4): the plain run and the forced-hub
        # run share (id, dist_milli), so both SSSP engine paths ride one
        # tagged slot (freeing a slot for bm25_topk). Tag column keeps
        # either run's regression independently hash-visible.
        e = _edges_milli(spark, sf).where(F.col("src") < F.col("dst"))
        res = _engine(spark).run(SSSP(source=0), e, max_iters=16)
        plain = res.state.where(F.col("dist") != float("inf")).select(
            F.lit("plain").alias("variant"),
            "id",
            F.col("dist").cast("long").alias("dist_milli"),
        )
        hub = sssp_hub_milli(spark, sf).select(
            F.lit("hub").alias("variant"), "id", "dist_milli"
        )
        return plain.unionByName(hub)

    def sssp_hub_milli(spark, sf):
        # SSSP over HUB_EDGES_MILLI with the engine's hub cap forced to 64:
        # vertex 0 (outdeg 15k at sf0.01) splits into salted adjacency
        # chunks, so hub-salting x needs_weights x uses_frontier all
        # interact under the hash oracle — gate coverage for the E9 path
        # the orders-derived graph alone never triggers (max outdeg ~35).
        from fog_spark.plans.engine import ScatterGatherEngine

        eng = ScatterGatherEngine(
            spark, checkpoint_dir=None, collect_lineage=False, hub_cap=64
        )
        e = _edges_hub_milli(spark, sf).where(F.col("src") < F.col("dst"))
        res = eng.run(SSSP(source=0), e, max_iters=16)
        return res.state.where(F.col("dist") != float("inf")).select(
            "id", F.col("dist").cast("long").alias("dist_milli")
        )

    def scc_labels(spark, sf):
        return _scc_state(spark, sf)

    def msf_edges_milli(spark, sf):
        # Borůvka forest on the milli-weighted graph; weights are exact
        # longs and the (w, a, b) total order makes the forest unique, so
        # the unrolled-Borůvka DuckDB oracle hash-matches edge-for-edge
        # (plus the pytest Kruskal oracle in tests/test_msf.py).
        return _msf_forest(spark, sf).select(
            "a", "b", F.col("w").cast("long").alias("w_milli")
        )

    def ppr8_milli(spark, sf):
        from fog_spark.algos import PPRMilli

        res = _engine(spark).run(PPRMilli(seed=0, niters=8), _edges(spark, sf))
        return res.state.select("id", "rank_milli")

    def frontier_plan_q(spark, sf):
        # the composed crawl-scheduler plan under ONE oracle (VERDICT r03
        # "Next round" #6): pages -> crawl_frontier (host-PageRank-scored
        # link candidates, RFC 9309 robots filter with a wildcard AND an
        # anchored allow exercised UNDER the hash check) -> sitemap seed
        # union (robots-filtered, crawled/planned anti-joined) -> trap-
        # template subtraction (a planted /cal?d=N family, 500 distinct
        # urls on h9, must vanish; the /p/N templates stay below the
        # threshold and survive). Links are formulaic in doc_id, so the
        # DuckDB side re-derives every stage arithmetically.
        from fog_spark.operators.crawl import frontier_plan
        from fog_spark.operators.robots import parse_robots

        d = _docs(spark, sf)
        did = F.col("doc_id").cast("long")

        def href(h, p):
            return F.concat(
                F.lit('<a href="https://h'), h.cast("string"),
                F.lit(".test/p/"), p.cast("string"), F.lit('">x</a>'),
            )

        l1 = href((did * 7 + 1) % 23, did * 3)
        l2 = href((did * 13 + 5) % 23, did * 5)
        trap = F.concat(
            F.lit('<a href="https://h9.test/cal?d='), did.cast("string"),
            F.lit('">t</a>'),
        )
        html = F.concat(
            F.lit("<html><body>"), l1, l2,
            F.when(did % 3 == 0, l1).otherwise(F.lit("")),
            trap, F.lit("</body></html>"),
        )
        pages = d.select(
            F.concat(
                F.lit("https://h"), (did % 23).cast("string"),
                F.lit(".test/p/"), did.cast("string"),
            ).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        # h5 adds a Crawl-delay (after the rules — any directive closes
        # a UA header block, but group membership persists); h2's robots
        # carries ONLY a delay (no rules). Both feed schedule_fetches so
        # crawl_delays + the per-host fetch timeline sit under the hash.
        robots = spark.createDataFrame(
            [
                (
                    "h5.test",
                    "User-agent: *\nDisallow: /p/1*\nAllow: /p/13$\nCrawl-delay: 2",
                ),
                ("h2.test", "User-agent: *\nCrawl-delay: 0.5"),
            ],
            "host string, body string",
        )
        sm_h2 = (
            "<urlset>"
            + "".join(f"<url><loc>https://h2.test/p/{k}</loc></url>" for k in range(30))
            + "</urlset>"
        )
        sm_h5 = (
            "<urlset>"
            + "".join(f"<url><loc>https://h5.test/p/{k}</loc></url>" for k in range(10, 20))
            + "</urlset>"
        )
        sitemaps = spark.createDataFrame(
            [
                ("https://h2.test/sitemap.xml", sm_h2),
                ("https://h5.test/sitemap.xml", sm_h5),
            ],
            "sitemap_url string, body string",
        )
        from fog_spark.operators.crawl import schedule_fetches
        from fog_spark.operators.robots import crawl_delays

        plan = frontier_plan(
            pages,
            robots_rules=parse_robots(robots),
            sitemaps=sitemaps,
            niters=4,
            trap_min_urls=100,
            resolve=False,
        ).select(
            "url", "host",
            F.col("n_refs").cast("long").alias("n_refs"),
            F.col("host_rank_milli").cast("long").alias("host_rank_milli"),
            "via",
        )
        out = schedule_fetches(
            plan, crawl_delays(robots), default_delay_s=1.0, url_col="url",
            keep_cols=True,
        )
        return out.withColumn(
            "fetch_offset_ms", F.col("fetch_offset_ms").cast("long")
        )

    def msbfs4(spark, sf):
        return _msbfs_state(spark, sf)

    def harmonic4_milli(spark, sf):
        d = _msbfs_state(spark, sf)
        return (
            d.where(F.col("dist") > 0)
            .groupBy("id")
            .agg(
                F.sum(F.expr("1000000 div dist")).cast("long").alias("harmonic_milli"),
                F.count("*").cast("long").alias("n_seeds_reaching"),
            )
        )

    def anchor_reach8(spark, sf):
        from fog_spark.algos.reach import anchor_reachability

        return anchor_reachability(_edges(spark, sf), n_anchors=16, rounds=8)

    def walks_corpus4(spark, sf):
        # gate-cap merging (round 4): both deterministic walk corpora
        # share the (walk_id, step, vertex) shape, so DeepWalk-style
        # first-order walks and node2vec second-order walks ride ONE
        # tagged slot (freeing a slot for redirect_resolve). md5 hash
        # family (oracle-portable); xxhash64 is the production fast
        # path, pinned equal-by-construction via pytest oracles.
        from fog_spark.operators.node2vec import node2vec_walks
        from fog_spark.operators.walks import random_walks

        rw = random_walks(_edges(spark, sf), walk_len=4, hash_fn="md5")
        # p=4, q=1/4 (outward-biased), 3 rejection trials
        n2 = node2vec_walks(
            _edges(spark, sf), walk_len=4, p=4, q=0.25, trials=3, hash_fn="md5"
        )
        return rw.select(F.lit("rw").alias("kind"), "*").unionByName(
            n2.select(F.lit("n2v").alias("kind"), "*")
        )

    def redirect_resolve(spark, sf):
        # bounded pointer-doubled redirect-chain resolution over a
        # functional map derived from the edge table (min target string
        # per source; string ids exercise the URL-typed path). The
        # custkey/orderkey%151 graph yields real chains AND cycles, so
        # both outcomes (resolved with exact hop count / capped at
        # max_hops) are under the hash. Oracle replays the 16 hops
        # sequentially — agreement pins the doubling's hop exactness.
        from fog_spark.operators.redirects import resolve_redirects

        m = _edges(spark, sf).select(
            F.col("src").cast("string").alias("url"),
            F.col("dst").cast("string").alias("target"),
        )
        return resolve_redirects(m, max_hops=16)

    def host_pagerank4(spark, sf):
        # the flagship composed pipeline at gate scale (north_star
        # shape): pages (url, html) -> href extraction -> host rollup
        # (operators/hostgraph.py) -> dense host ids -> weight-
        # proportional PageRank over the aggregated host multigraph.
        # Links are FORMULAIC in doc_id, so the oracle re-derives the
        # host edge multiset arithmetically — independently checking the
        # whole chain: href regexp, host_of, rollup counts, dense-id
        # order, and the milli recurrence.
        from fog_spark.operators.hostgraph import host_pagerank_milli

        d = _docs(spark, sf)
        did = F.col("doc_id").cast("long")

        def href(h, p):
            return F.concat(
                F.lit('<a href="https://h'), h.cast("string"),
                F.lit(".test/p/"), p.cast("string"), F.lit('">x</a>'),
            )

        l1 = href((did * 7 + 1) % 23, did * 3)
        l2 = href((did * 13 + 5) % 23, did * 5)
        html = F.concat(
            F.lit("<html><body>"), l1, l2,
            F.when(did % 3 == 0, l1).otherwise(F.lit("")),
            F.lit("</body></html>"),
        )
        pages = d.select(
            F.concat(
                F.lit("https://h"), (did % 23).cast("string"),
                F.lit(".test/p/"), did.cast("string"),
            ).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        return host_pagerank_milli(spark, pages, niters=4)

    def spcont8(spark, sf):
        # also the gate slot for shortest_path_counts: the continuation
        # terms consume the forward sigma pass, so a wrong sigma cannot
        # hash-match here (spcount keeps its own pytest oracle —
        # tests/test_msbfs.py)
        from fog_spark.algos.msbfs import sp_continuations

        return sp_continuations(_edges(spark, sf), [0, 1, 2, 3], max_rounds=8)

    def wpagerank8_milli(spark, sf):
        from fog_spark.algos.pagerank import WeightedPageRankMilli

        res = _engine(spark).run(WeightedPageRankMilli(niters=8), _edges(spark, sf))
        return res.state.select("id", "rank_milli")

    def hits_salsa4_milli(spark, sf):
        # one gate slot, two link-analysis twins (gate-cap merging,
        # VERDICT r02 finding 1): Kleinberg HITS and Lempel-Moran SALSA
        # share the vertex set, so their integer-milli scores join into
        # one frame and the combined oracle checks both code paths.
        from fog_spark.algos.hits import hits_milli
        from fog_spark.algos.salsa import salsa_milli

        e = _edges(spark, sf)
        return hits_milli(e, iters=4).join(salsa_milli(e, iters=4), "id")

    def neighbor_sample3(spark, sf):
        from fog_spark.operators.sampling import sample_neighbors

        return sample_neighbors(_edges(spark, sf), k=3, hash_fn="md5")

    def ktruss3_kcore10(spark, sf):
        # gate-cap merge (frees a slot for frontier_plan, round 4): the
        # two subgraph-extraction peels share one slot via a kind tag —
        # kcore rows are (id, degree), ktruss rows are (a, b) edges.
        # k=10 actually peels on the orders-derived graph (840/1500
        # vertices survive at sf0.01); smaller k keeps everything.
        from fog_spark.algos import k_core
        from fog_spark.algos.ktruss import k_truss

        e = _edges(spark, sf)
        kc = k_core(e, k=10, max_rounds=16).select(
            F.lit("kcore").alias("kind"),
            F.col("id").cast("long").alias("x"),
            F.col("degree").cast("long").alias("y"),
        )
        kt = k_truss(e, k=3, max_rounds=4).select(
            F.lit("ktruss").alias("kind"),
            F.col("a").cast("long").alias("x"),
            F.col("b").cast("long").alias("y"),
        )
        return kc.unionByName(kt)

    def mis12(spark, sf):
        # md5 hash family (oracle-portable); xxhash64 is the production
        # fast path, pinned equal-shape via pytest oracles
        from fog_spark.algos.mis import maximal_independent_set

        return maximal_independent_set(
            _edges(spark, sf), max_rounds=12, hash_fn="md5"
        )

    def hyperball8(spark, sf):
        # md5 hash family (oracle-portable); the integer sum2k/zeros
        # contract makes the HLL sketch hash-checkable cross-engine
        from fog_spark.algos.hyperball import hyperball_sketches

        return hyperball_sketches(
            _edges(spark, sf), m=16, rounds=8, hash_fn="md5"
        )

    def _lpa5_state(spark, sf):
        key = ("lpa5", sf)
        if key not in _STATE_CACHE:
            res = _engine(spark).run(LabelPropagation(max_iters=5), _edges(spark, sf))
            _STATE_CACHE[key] = res.state.select("id", "label")
        return _STATE_CACHE[key]

    def lpa5_labels_modularity(spark, sf):
        # per-vertex labels AND the labeling's integer modularity in one
        # gate slot: the single (q_plus1_milli, m_edges) row is broadcast-
        # cross-joined onto every label row, so BOTH the LPA fixpoint and
        # the modularity operator stay value-hash-checked
        from fog_spark.algos.modularity import modularity_plus1_milli

        labels = _lpa5_state(spark, sf)
        q = modularity_plus1_milli(_edges(spark, sf), labels)
        return labels.crossJoin(F.broadcast(q))

    def co_project_capped(spark, sf):
        from fog_spark.operators.projection import co_project

        # cap 95 excludes the denser two-thirds of the gate graph's hub
        # dsts, so the cap path itself is exercised, not just the join
        return co_project(_edges(spark, sf), max_dst_degree=95, min_shared=3)

    def egonet2(spark, sf):
        from fog_spark.algos.msbfs import ego_network

        return ego_network(_edges(spark, sf), [0, 1, 2, 3], k=2)

    def clustering_coeff(spark, sf):
        # per-vertex triangle counts + local clustering coefficients; the
        # global triangle count is sum(tri)/3 of this frame (the former
        # separate triangle_count entry — retired to fit the gate window)
        from fog_spark.algos.triangles import clustering_coefficients

        return clustering_coefficients(_edges(spark, sf)).select(
            "id",
            F.col("degree").cast("long").alias("degree"),
            "tri",
            # lcc = 2*tri/(d*(d-1)) on small exact ints — bit-stable
            "lcc",
        )

    def weblinks_norm(spark, sf):
        # crawl-ingest chain in one slot: body-text byte-identity
        # (input_hint, via text_ok) + anchor extraction + href
        # resolution (root-relative, ../-relative, protocol-relative)
        # + canonicalization (host lowercasing, default-port strip) +
        # rel=nofollow + fragment/mailto drops (functions/urlnorm.py).
        # Hrefs are FORMULAIC in doc_id, so the oracle derives every
        # expected row arithmetically — independent of the regex /
        # resolution implementation on the Spark side.
        from fog_spark.functions.urlnorm import page_links

        d = _docs(spark, sf)
        k = F.col("doc_id").cast("long")
        html = F.concat(
            F.lit("<html><head><title>doc</title></head><body>"),
            F.col("text"),
            F.lit('<a href="/p/'), (k * 7 + 1).cast("string"),
            F.lit('">p</a><a href="../x/'), (k * 3).cast("string"),
            F.lit('.html">x</a><a rel="nofollow" href="//Host'),
            ((k + 1) % 7).cast("string"),
            F.lit('.test/nf">n</a><a href="#top">f</a>'),
            F.lit('<a href="mailto:a@b.c">m</a></body></html>'),
        )
        pages = d.select(
            "text",
            F.concat(
                F.lit("https://Host"), (k % 7).cast("string"),
                F.lit(".test:443/d/"), k.cast("string"),
                F.lit("/index.html"),
            ).alias("url"),
            F.encode(html, "UTF-8").alias("html"),
        )
        links = page_links(pages)
        text_ok = extract_text_col(F.col("html")) == F.col("text")
        return links.join(
            pages.select("url", text_ok.alias("text_ok")), "url"
        ).select("url", "dst_url", "anchor", "nofollow", "text_ok")

    def doc_stats(spark, sf):
        # the full per-document text-analysis surface in one slot (gate-
        # cap merging, VERDICT r02 finding 1): quality + Gopher-style
        # repetition signals + lang-id + portable fingerprint. All four
        # are per-row Column math over the same scan, so the join is a
        # formality Catalyst collapses; each keeps its own named columns
        # so a single wrong feature still hash-fails the slot.
        from fog_spark.operators.text import repetition_features

        d = _docs(spark, sf)
        q = quality_features(d).select(
            "id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "mean_token_len",
            "alpha_ratio",
            "punct_ratio",
            "stopword_ratio",
            "quality_score",
        )
        from fog_spark.operators.text import pretoken_count

        pt = d.select(
            F.col("doc_id").alias("id"),
            pretoken_count(F.col("text")).alias("n_pretokens"),
        )
        return (
            q.join(repetition_features(d), "id")
            .join(lang_id(d), "id")
            .join(doc_fingerprint_portable(d), "id")
            .join(pt, "id")
        )

    def bm25_topk(spark, sf):
        # inverted-index retrieval: BM25 integer-micro twin over the
        # documents table for four fixed keyword queries — postings,
        # query-term df, length normalization and the top-10 ranking all
        # under one hash (rank ties break on doc_id; integer scores make
        # the order engine-independent). The float-idf production path
        # is pytest-pinned (tests/test_index.py).
        from fog_spark.operators.index import bm25_topk_micro

        return bm25_topk_micro(_docs(spark, sf), BM25_QUERIES, k=10)

    def dedup_exact_md5(spark, sf):
        return exact_dedup(_docs(spark, sf), hash_fn="md5")

    def corpus_prep(spark, sf):
        # end-to-end training-corpus prep pipeline: quality gate
        # (score >= 0.5; nearest doc sits 1.4e-5 from the boundary, far
        # above fp noise) -> exact dedup keeping the min doc_id per
        # md5(text) group -> per-language doc/token totals. One quality
        # scan, one dedup shuffle, one final agg — the shape a 100 TB
        # corpus build takes.
        from pyspark.sql import Window as W

        docs = _docs(spark, sf)
        q = quality_features(docs).select("id", "n_tokens", "quality_score")
        d = docs.select(F.col("doc_id").alias("id"), "lang", "text").join(q, "id")
        surv = d.where(F.col("quality_score") >= 0.5)
        # single-pass dedup: row_number over the hash group instead of
        # groupBy-min + join-back, which would recompute the regexp-heavy
        # quality scan twice (measured 2x at sf0.1). Window dedup sorts
        # each hash group in one task — under extreme duplicate skew
        # (one text repeated 10^8 times) use operators.dedup.exact_dedup
        # instead, whose groupBy gets map-side partial aggregation.
        w = W.partitionBy(F.md5("text")).orderBy("id")
        kept = surv.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
        # stratified corpus sampling rides the same pipeline (the "keep
        # 40% of English, all of German" curation step): md5-keyed so the
        # oracle replays the keep decision bit-for-bit; the keep set is a
        # pure function of doc id — stable under repartitioning/retries.
        from fog_spark.operators.sampling import stratified_sample

        sampled = stratified_sample(
            kept, strata="lang", fractions={"en": 0.4, "de": 0.8},
            key="id", default_fraction=0.6, hash_fn="md5",
        )
        return sampled.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )

    def minhash_candidates(spark, sf):
        # bucket_cap=2 is BELOW sf0.01's largest band bucket (3 docs), so
        # the degenerate-bucket cap-and-chain path (dedup.py module doc)
        # runs UNDER the DuckDB hash check — the oracle replays the same
        # window-rank chain. Production default is 2000/8.
        return minhash_md5_candidates(
            _docs(spark, sf), num_hashes=8, bands=4, shingle_n=3,
            bucket_cap=2, chain_window=1,
        )

    def near_dup_clusters_q(spark, sf):
        # the full fuzzy-dedup composition under one oracle: md5-portable
        # MinHash -> LSH buckets -> per-bucket star edges -> exact-Jaccard
        # edge verification -> star-contraction CC (cc_star.py — this slot
        # is also the star-contraction gate check, ex component_sizes).
        # The DuckDB side re-derives the clusters via a recursive-CTE
        # transitive closure over independently recomputed star edges.
        from fog_spark.operators.dedup import near_dup_clusters

        return near_dup_clusters(
            spark, _docs(spark, sf), num_hashes=8, bands=4, shingle_n=3,
            jaccard_threshold=0.2, hash_fn="md5",
        )

    def mirror_hosts_q(spark, sf):
        # mirror-host detection over a synthesized two-copy layout: every
        # doc lives on h{doc_id%23}.test, even docs are replicated onto
        # m{doc_id%23}.test (the mirror), and a boilerplate body sits on
        # ALL hosts — which the fingerprint-df cap (10) must drop, or the
        # result gains a 46-host clique and hash-fails. Expected shape:
        # each m_k is fully contained in h_k (overlap_permille = 1000).
        from fog_spark.operators.mirrors import mirror_hosts

        d = _docs(spark, sf)
        did = F.col("doc_id").cast("long")
        url_at = lambda prefix: F.concat(  # noqa: E731
            F.lit(f"https://{prefix}"), (did % 23).cast("string"),
            F.lit(".test/p"), did.cast("string"),
        )
        hosts = spark.range(23).select(F.col("id").cast("long").alias("k"))
        boiler = hosts.select(
            F.explode(
                F.array(
                    F.concat(F.lit("https://h"), F.col("k").cast("string"), F.lit(".test/")),
                    F.concat(F.lit("https://m"), F.col("k").cast("string"), F.lit(".test/")),
                )
            ).alias("url"),
            F.lit("BOILERPLATE FOOTER").alias("text"),
        )
        pages = (
            d.select(url_at("h").alias("url"), "text")
            .unionByName(d.where(did % 2 == 0).select(url_at("m").alias("url"), "text"))
            .unionByName(boiler)
        )
        return mirror_hosts(pages, min_shared=2, max_fp_hosts=10)

    def spam_mass8_milli(spark, sf):
        # trust-vs-rank mass comparison: one slot gate-checks THREE code
        # paths — UniformPageRankMilli, TrustRankMilli (seed-set teleport,
        # 4 seeds), and the integer rescale/ratio arithmetic of
        # algos/spam.py (any of them wrong -> hash fail).
        from fog_spark.algos.spam import spam_mass_milli

        return spam_mass_milli(
            spark, _edges(spark, sf), trust_seeds=[0, 1, 2, 3], niters=8
        )

    def jaccard_pairs(spark, sf):
        # df cap 50: a near-universal shingle would otherwise cost
        # O(df^2) self-join rows (mirrored in the oracle)
        return ngram_jaccard_pairs(
            _docs(spark, sf), threshold=0.2, shingle_n=3, max_shingle_df=50
        )

    def simhash_pairs(spark, sf):
        # md5-portable 48-bit twin (3x16-bit banding): every step is exact
        # integer math DuckDB reproduces -> hash-checked. The xxhash64
        # 64-bit simhash_near_dups is the production fast path (pytest).
        # bucket_cap=16 is BELOW sf0.01's hottest chunk bucket (28 docs),
        # so the cap-and-chain degenerate guard runs under the oracle.
        from fog_spark.operators.dedup import simhash_md5_near_dups

        return simhash_md5_near_dups(
            _docs(spark, sf), max_hamming=8, id_col="doc_id",
            bucket_cap=16, chain_window=4,
        ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))

    def lsh_ann_topk_ids(spark, sf):
        # hyperplane LSH uses xxhash64-derived planes -> rows-only check
        from fog_spark.operators.similarity import lsh_ann_topk

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        probes = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return lsh_ann_topk(emb, probes, k=5, nplanes=4, ntables=8).select(
            "probe_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
        )

    def ivf_ann_topk_ids(spark, sf):
        # IVF: kmeans codebook (hash-seeded, fixed Lloyd sweeps) -> probes
        # scan nprobe/ncells of the corpus. Float kmeans isn't
        # SQL-portable -> rows-only; pytest checks recall + determinism.
        from fog_spark.operators.similarity import ivf_ann_topk

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        probes = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return ivf_ann_topk(emb, probes, k=5, ncells=8, nprobe=3).select(
            "probe_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
        )

    def embedding_near_dup_pairs(spark, sf):
        # exact all-pairs verifier (the oracle twin of the LSH-bucketed
        # scale path). Pair ids only: cosine VALUES are raw IEEE doubles
        # whose summation order an engine may reorder; the >= threshold
        # decision is stable (min |cos - 0.4| is 1.3e-4 on the synthetic
        # embeddings — far above fp noise) but the hash must not depend
        # on the float bits. 0.4 yields ~60 pairs at sf0.01; higher
        # thresholds match nothing on this corpus (max cosine 0.51).
        from fog_spark.operators.similarity import embedding_near_dups_exact

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return embedding_near_dups_exact(emb, threshold=0.4).select("id_a", "id_b")

    def cosine_topk_ids(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        probes = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        return cosine_topk(emb, probes, k=5).select(
            "probe_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
        )

    def media_features(spark, sf):
        # multimodal plumbing through the driver gate: synth media ->
        # mapInPandas fake-decode (Arrow batches). The fake features are
        # payload bytes / 255, so their byte-sum is integer-exact and the
        # sha256-derived payload is reproducible in DuckDB -> hash-checked
        # (kind is xxhash64-derived, hence not part of the output).
        # Round 5 adds REAL audio under the same hash: synth_wav builds
        # genuine 16-bit RIFF/WAV bytes from a deterministic PCM formula,
        # wav_features must round-trip the container with the stdlib
        # wave module, and the oracle recomputes peak/sum-of-squares/
        # duration from the formula via generate_series — integer-exact.
        from fog_spark.operators.multimodal import (
            extract_features,
            synth_media,
            synth_wav,
            wav_features,
        )

        feats = extract_features(synth_media(spark, 200), fake=True)
        byte_sum = F.round(
            F.aggregate(
                "feature", F.lit(0.0), lambda acc, v: acc + v.cast("double")
            )
            * 255.0
        ).cast("long")
        wav = wav_features(synth_wav(spark, 200)).select(
            "media_id",
            F.col("n_samples").alias("wav_n_samples"),
            F.col("duration_ms").alias("wav_duration_ms"),
            F.col("peak").alias("wav_peak"),
            F.col("sum_sq").alias("wav_sum_sq"),
        )
        return feats.select(
            "media_id",
            F.col("n_bytes").cast("long").alias("n_bytes"),
            byte_sum.alias("feat_byte_sum"),
        ).join(wav, "media_id")

    def event_daily_windows(spark, sf):
        # tumbling 1-day windows per event type — the batch twin of the
        # streaming ingest's watermarked windowed aggregation; session tz
        # is pinned UTC so to_date and DuckDB's CAST(ts AS DATE) agree
        ev = spark.read.parquet(f"{sf}/events.parquet")
        cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
        return ev.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )

    def user_event_stats(spark, sf):
        from pyspark.sql import Window as W

        ev = spark.read.parquet(f"{sf}/events.parquet")
        cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
        w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
        top = (
            ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("event_id").alias("top_event_id"))
        )
        agg = ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
            F.countDistinct("event_type").alias("n_types"),
        )
        return agg.join(top, "user_id")

    def nation_revenue(spark, sf):
        # TPC-H Q5 shape: fact-fact shuffle joins (lineitem x orders x
        # customer) with broadcast dimension joins (supplier, nation,
        # region) — the relational-checklist multi-join (SURVEY 2.4).
        # Money in exact integers: cents x (100 - discount%) so the hash
        # never touches float summation order.
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet")
        c = spark.read.parquet(f"{sf}/customer.parquet")
        s = spark.read.parquet(f"{sf}/supplier.parquet")
        n = spark.read.parquet(f"{sf}/nation.parquet")
        r = spark.read.parquet(f"{sf}/region.parquet")
        pc = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        dp = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(
                F.broadcast(s),
                (li["l_suppkey"] == s["s_suppkey"])
                & (c["c_nationkey"] == s["s_nationkey"]),
            )
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("n_name")
            .agg(
                F.count("*").alias("n_lineitems"),
                F.sum(pc * (100 - dp)).alias("revenue_cbp"),
            )
        )

    def segment_revenue(spark, sf):
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        return (
            orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"), F.sum(cents).alias("revenue_cents"))
        )

    # EXACTLY 50 entries: round 2's driver checked the first 50 of 60 in
    # dict order and left the rest officially untested, so derivative
    # entries were merged (text_scans = edgelist+adjlist; spmv_milli =
    # y and yx columns; lpa5_labels_modularity = labels x modularity;
    # clustering_coeff subsumes triangle_count; component_sizes subsumes
    # num_components) and pure aggregations of sibling queries retired
    # (top_pagerank, scc_sizes, msf_total_weight, degree_histogram,
    # out/in_degrees — all derivable from checked frames). The 10 queries
    # round 2 never checked now sit in the first 15 slots.
    # Round 3 frees three more slots the same way (doc_stats absorbs
    # lang_id + fingerprints as extra columns; corpus_prep absorbs
    # stratified sampling as a pipeline stage; near_dup_clusters takes
    # over component_sizes' star-contraction check) and spends them on
    # spam_mass8_milli, mirror_hosts, near_dup_clusters.
    q = {
        "text_scans": text_scans,
        "graph_stats": graph_stats,
        "adjacency_csr": adjacency_csr,
        "in_adjacency_csr": in_adjacency_csr,
        "spmv_milli": spmv_milli,
        "simhash_pairs": simhash_pairs,
        "cosine_topk_ids": cosine_topk_ids,
        "lsh_ann_topk_ids": lsh_ann_topk_ids,
        "ivf_ann_topk_ids": ivf_ann_topk_ids,
        "embedding_near_dup_pairs": embedding_near_dup_pairs,
        "media_features": media_features,
        "user_event_stats": user_event_stats,
        "event_daily_windows": event_daily_windows,
        "segment_revenue": segment_revenue,
        "nation_revenue": nation_revenue,
        "pagerank_fog10_milli": pagerank_fog10_milli,
        "connected_components": connected_components,
        "spam_mass8_milli": spam_mass8_milli,
        "bfs_levels": bfs_levels,
        "sssp16_milli": sssp16_milli,
        "bm25_topk": bm25_topk,
        "scc_labels": scc_labels,
        "msf_edges_milli": msf_edges_milli,
        "ppr8_milli": ppr8_milli,
        "frontier_plan": frontier_plan_q,
        "walks_corpus4": walks_corpus4,
        "redirect_resolve": redirect_resolve,
        "hyperball8": hyperball8,
        "mis12": mis12,
        "ktruss3_kcore10": ktruss3_kcore10,
        "hits_salsa4_milli": hits_salsa4_milli,
        "wpagerank8_milli": wpagerank8_milli,
        "host_pagerank4": host_pagerank4,
        "spcont8": spcont8,
        "egonet2": egonet2,
        "co_project_capped": co_project_capped,
        "neighbor_sample3": neighbor_sample3,
        "msbfs4": msbfs4,
        "harmonic4_milli": harmonic4_milli,
        "anchor_reach8": anchor_reach8,
        "lpa5_labels_modularity": lpa5_labels_modularity,
        "clustering_coeff": clustering_coeff,
        "weblinks_norm": weblinks_norm,
        "doc_stats": doc_stats,
        "mirror_hosts": mirror_hosts_q,
        "dedup_exact_md5": dedup_exact_md5,
        "corpus_prep": corpus_prep,
        "near_dup_clusters": near_dup_clusters_q,
        "minhash_candidates": minhash_candidates,
        "jaccard_pairs": jaccard_pairs,
    }
    assert len(q) == 50, f"gate window is 50 queries, got {len(q)}"

    def _tuned(fn):
        def wrap(spark, sf):
            _tune_session(spark)
            return fn(spark, sf)

        return wrap

    return {k: _tuned(fn) for k, fn in q.items()}


# ------------------------------------------------------------- oracle SQL

def _pretoken_re_sql() -> str:
    """The EXACT pre-tokenizer regex the Spark side uses, SQL-quoted —
    one source of truth so the engines cannot drift."""
    from fog_spark.operators.text import PRETOKEN_RE

    return PRETOKEN_RE.replace("'", "''")


def oracle_sql() -> dict[str, str]:
    stop = {
        "de": "['der','die','das','und','ist','nicht','ein','mit','auf','von']",
        "en": "['the','and','of','to','in','is','that','it','for','was']",
        "es": "['el','la','los','que','de','es','en','un','por','con']",
        "fr": "['le','la','les','et','est','pas','une','des','dans','pour']",
    }
    shingles = (
        "list_distinct([array_to_string(toks[i:i+2], ' ') "
        "for i in range(1, len(toks) - 1)])"
    )
    quality = f"""
WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
b AS (SELECT doc_id,
  length(text) AS n_chars,
  len(toks) AS n_tokens,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
  len(list_filter(toks, x -> list_contains({stop['en']}, x))) AS stop_hits
FROM t),
rep0 AS (SELECT doc_id, toks,
  [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))] AS bigrams,
  [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)] AS trigrams,
  list_filter(string_split(text, chr(10)), x -> len(x) > 0) AS lines
FROM t),
rep AS (SELECT doc_id,
  CASE WHEN len(toks) > 0 THEN 1.0 - len(list_distinct(toks)) / len(toks) ELSE 0.0 END AS dup_token_ratio,
  CASE WHEN len(bigrams) > 0
    THEN list_max(map_values(list_aggregate(bigrams, 'histogram'))) / len(bigrams) ELSE 0.0 END AS top_bigram_frac,
  CASE WHEN len(trigrams) > 0
    THEN list_max(map_values(list_aggregate(trigrams, 'histogram'))) / len(trigrams) ELSE 0.0 END AS top_trigram_frac,
  CASE WHEN len(lines) > 0 THEN 1.0 - len(list_distinct(lines)) / len(lines) ELSE 0.0 END AS dup_line_ratio
FROM rep0),
r AS (SELECT doc_id, n_chars, n_tokens,
  CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END AS mean_token_len,
  CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END AS alpha_ratio,
  CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
  CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END AS stopword_ratio
FROM b),
lh AS (SELECT doc_id,
  len(list_filter(toks, x -> list_contains({stop['de']}, x))) AS h_de,
  len(list_filter(toks, x -> list_contains({stop['en']}, x))) AS h_en,
  len(list_filter(toks, x -> list_contains({stop['es']}, x))) AS h_es,
  len(list_filter(toks, x -> list_contains({stop['fr']}, x))) AS h_fr
FROM t),
lg AS (SELECT doc_id,
  CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
       WHEN h_es >= h_fr THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM lh),
fp AS (SELECT doc_id,
  CAST(COALESCE(list_sum(
    [i * (CAST('0x' || substr(md5(toks[i]), 1, 12) AS BIGINT) % 1000000000000)
     for i in range(1, len(toks) + 1)]), 0) AS BIGINT) AS fingerprint
FROM t),
pt AS (SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_pretoken_re_sql()}'))
    AS BIGINT) AS n_pretokens
FROM t)
SELECT r.doc_id AS id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
  mean_token_len, alpha_ratio, punct_ratio, stopword_ratio,
  LEAST(n_tokens / 100.0, 1.0) * 0.4 + alpha_ratio * 0.3
    + LEAST(stopword_ratio * 5.0, 1.0) * 0.2
    + (1.0 - LEAST(punct_ratio * 10.0, 1.0)) * 0.1 AS quality_score,
  rep.dup_token_ratio, rep.top_bigram_frac, rep.top_trigram_frac, rep.dup_line_ratio,
  lg.lang_pred, fp.fingerprint, pt.n_pretokens
FROM r JOIN rep ON r.doc_id = rep.doc_id
JOIN lg ON lg.doc_id = r.doc_id JOIN fp ON fp.doc_id = r.doc_id
JOIN pt ON pt.doc_id = r.doc_id"""

    return {
        "text_scans": (
            f"SELECT 'edge' AS fmt, src, dst FROM ({EDGES}) "
            f"UNION ALL SELECT 'adj' AS fmt, src, dst FROM ({EDGES}) "
            f"UNION ALL SELECT 'fog' AS fmt, src, dst FROM ({EDGES})"
        ),
        "graph_stats": f"""
WITH e AS ({EDGES}), d AS (SELECT src, COUNT(*) AS c FROM e GROUP BY src),
ed AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
od AS (SELECT src, COUNT(*) AS c FROM ed GROUP BY src),
ig AS (SELECT dst, COUNT(*) AS c FROM ed GROUP BY dst),
px AS (SELECT od.c AS x, ig.c AS y FROM ed
       JOIN od ON ed.src = od.src JOIN ig ON ed.dst = ig.dst),
s AS (SELECT COUNT(*) AS n, COALESCE(SUM(x), 0) AS sxo, COALESCE(SUM(y), 0) AS syi,
             COALESCE(SUM(x*y), 0) AS sxy, COALESCE(SUM(x*x), 0) AS sx2,
             COALESCE(SUM(y*y), 0) AS sy2 FROM px),
r AS (SELECT COUNT(*) AS nr FROM ed a JOIN ed b ON a.src = b.dst AND a.dst = b.src),
-- incremental-triangle-delta oracle: RECOUNT new/old/common in full
-- (Spark runs the delta-local inclusion-exclusion; agreement proves
-- the incremental path). old = edges with (src+dst)%19 != 0.
cn AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM e WHERE src <> dst),
co AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM e WHERE src <> dst AND (src + dst) % 19 <> 0),
cc AS (SELECT a, b FROM cn INTERSECT SELECT a, b FROM co),
tn AS (SELECT COUNT(*) AS t FROM cn e1
       JOIN cn e2 ON e2.a = e1.b JOIN cn e3 ON e3.a = e1.a AND e3.b = e2.b),
tl AS (SELECT COUNT(*) AS t FROM co e1
       JOIN co e2 ON e2.a = e1.b JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b),
tc AS (SELECT COUNT(*) AS t FROM cc e1
       JOIN cc e2 ON e2.a = e1.b JOIN cc e3 ON e3.a = e1.a AND e3.b = e2.b),
td AS (SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cn WHERE NOT EXISTS
         (SELECT 1 FROM co WHERE co.a = cn.a AND co.b = cn.b)) AS td_added,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM co WHERE NOT EXISTS
         (SELECT 1 FROM cn WHERE cn.a = co.a AND cn.b = co.b)) AS td_removed,
        CAST((SELECT t FROM tn) - (SELECT t FROM tc) AS BIGINT) AS tri_gained,
        CAST((SELECT t FROM tl) - (SELECT t FROM tc) AS BIGINT) AS tri_lost,
        CAST((SELECT t FROM tn) - (SELECT t FROM tl) AS BIGINT) AS tri_delta)
SELECT (SELECT MIN(LEAST(src, dst)) FROM e) AS min_vertex_id,
       (SELECT MAX(GREATEST(src, dst)) FROM e) AS max_vertex_id,
       (SELECT COUNT(*) FROM e) AS num_edges,
       (SELECT CAST(MAX(c) AS BIGINT) FROM d) AS max_out_edges,
       CAST(s.n AS BIGINT) AS n_directed,
       CAST(r.nr AS BIGINT) AS n_reciprocal,
       -- // floors, Spark div truncates: identical for the nonnegative counts here
       CAST(CASE WHEN s.n = 0 THEN 0 ELSE (1000 * r.nr) // s.n END AS BIGINT)
           AS reciprocity_permille,
       CAST(s.sxo AS BIGINT) AS sxo, CAST(s.syi AS BIGINT) AS syi,
       CAST(s.sxy AS BIGINT) AS sxy, CAST(s.sx2 AS BIGINT) AS sx2,
       CAST(s.sy2 AS BIGINT) AS sy2,
       td.td_added, td.td_removed, td.tri_gained, td.tri_lost, td.tri_delta
FROM s, r, td""",
        "adjacency_csr": f"""
WITH e AS ({EDGES})
SELECT src, COUNT(*) AS outdeg,
       string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS dsts_csv
FROM e GROUP BY src""",
        "in_adjacency_csr": f"""
WITH e AS ({EDGES})
SELECT dst, COUNT(*) AS indeg,
       string_agg(CAST(src AS VARCHAR), ',' ORDER BY src) AS srcs_csv
FROM e GROUP BY dst""",
        "spmv_milli": f"""
WITH em AS ({EDGES_MILLI})
SELECT dst AS id, CAST(SUM(wm) AS BIGINT) AS y_milli,
       CAST(SUM(wm * (src % 97 + 1)) AS BIGINT) AS yx_milli
FROM em GROUP BY dst""",
        "pagerank_fog10_milli": _pagerank_milli_sql(10, "SELECT id, rank_milli FROM $LAST"),
        "connected_components": f"""
WITH RECURSIVE e AS ({EDGES}),
und AS (SELECT src, dst FROM e WHERE src <> dst UNION SELECT dst, src FROM e WHERE src <> dst),
v AS ({VERTS}),
reach(id, lbl) AS (
  SELECT id, id FROM v
  UNION
  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
)
SELECT id, CAST(MIN(lbl) AS BIGINT) AS component FROM reach GROUP BY id""",
        "spam_mass8_milli": _spam_mass_sql([0, 1, 2, 3], 8),
        "bfs_levels": f"""
WITH RECURSIVE e AS ({EDGES}),
g AS (SELECT src, dst FROM e WHERE src <> dst),
reach(id, lvl) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT g.dst, r.lvl + 1 FROM reach r JOIN g ON g.src = r.id WHERE r.lvl < 100
)
SELECT id, CAST(MIN(lvl) AS BIGINT) AS level FROM reach GROUP BY id""",
        "sssp16_milli": (
            f"SELECT 'plain' AS variant, * FROM ({_sssp_milli_sql(16)})\n"
            "UNION ALL\n"
            "SELECT 'hub' AS variant, * FROM "
            f"({_sssp_milli_sql(16, edges_sql=HUB_EDGES_MILLI)})"
        ),
        "bm25_topk": _bm25_sql(BM25_QUERIES, k=10),
        "msf_edges_milli": _msf_milli_sql(
            16, "SELECT a, b, CAST(w AS BIGINT) AS w_milli FROM forest"
        ),
        "scc_labels": f"""
WITH RECURSIVE e0 AS MATERIALIZED ({EDGES}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
v AS MATERIALIZED (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
reach(a, b) AS (
  SELECT id, id FROM v
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
)
SELECT r1.a AS id, CAST(MIN(r1.b) AS BIGINT) AS scc
FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
GROUP BY r1.a""",
        "ppr8_milli": _ppr_milli_sql(0, 8),
        "frontier_plan": _frontier_plan_sql(4, 100),
        "walks_corpus4": (
            f"SELECT 'rw' AS kind, * FROM ({_walks_sql(4)})\n"
            "UNION ALL\n"
            f"SELECT 'n2v' AS kind, * FROM ({_node2vec_sql(4, p=4, q=0.25, trials=3)})"
        ),
        "redirect_resolve": _redirect_sql(16),
        "hyperball8": _hyperball_sql(16, 8),
        "mis12": _mis_sql(12),
        "ktruss3_kcore10": f"""
SELECT 'kcore' AS kind, id AS x, degree AS y FROM ({_kcore_sql(10, 16)})
UNION ALL
SELECT 'ktruss' AS kind, a AS x, b AS y FROM ({_ktruss_sql(3, 4)})""",
        "hits_salsa4_milli": _hits_salsa_sql(4),
        "wpagerank8_milli": _wpagerank_milli_sql(8),
        "host_pagerank4": _host_pagerank_sql(4),
        "spcont8": _spcont_sql([0, 1, 2, 3], 8),
        "co_project_capped": _co_project_sql(95, 3),
        "egonet2": _msbfs_sql(
            [0, 1, 2, 3],
            2,
            "SELECT e.src, e.dst FROM e "
            "JOIN (SELECT DISTINCT id FROM $LAST) a ON a.id = e.src "
            "JOIN (SELECT DISTINCT id FROM $LAST) b ON b.id = e.dst",
        ),
        "neighbor_sample3": _neighbor_sample_sql(3),
        "anchor_reach8": _anchor_reach_sql(16, 8),
        "msbfs4": _msbfs_sql([0, 1, 2, 3], 16, "SELECT id, seed, dist FROM $LAST"),
        "harmonic4_milli": _msbfs_sql(
            [0, 1, 2, 3],
            16,
            "SELECT id, CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_milli, "
            "CAST(COUNT(*) AS BIGINT) AS n_seeds_reaching "
            "FROM $LAST WHERE dist > 0 GROUP BY id",
        ),
        "lpa5_labels_modularity": _lpa_labels_modularity_sql(5),
        "clustering_coeff": f"""
WITH e AS ({EDGES}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
deg AS (SELECT id, COUNT(*) AS degree FROM (
          SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id),
tris AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM und e1 JOIN und e2 ON e2.a = e1.b
         JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
per_v AS (SELECT id, COUNT(*) AS tri FROM (
            SELECT x AS id FROM tris UNION ALL SELECT y FROM tris
            UNION ALL SELECT z FROM tris) GROUP BY id)
SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
  CAST(COALESCE(p.tri, 0) AS BIGINT) AS tri,
  CASE WHEN d.degree >= 2
       THEN 2.0 * COALESCE(p.tri, 0) / (d.degree * (d.degree - 1.0))
       ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN per_v p ON p.id = d.id""",
        "weblinks_norm": r"""
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS k FROM documents),
u AS (SELECT k,
  'https://host' || CAST(k % 7 AS VARCHAR) || '.test' AS root,
  'https://Host' || CAST(k % 7 AS VARCHAR) || '.test:443/d/' ||
    CAST(k AS VARCHAR) || '/index.html' AS url
FROM d)
SELECT url, root || '/p/' || CAST(k * 7 + 1 AS VARCHAR) AS dst_url,
  'p' AS anchor, FALSE AS nofollow, TRUE AS text_ok FROM u
UNION ALL
SELECT url, root || '/d/x/' || CAST(k * 3 AS VARCHAR) || '.html', 'x', FALSE, TRUE FROM u
UNION ALL
SELECT url, 'https://host' || CAST((k + 1) % 7 AS VARCHAR) || '.test/nf', 'n', TRUE, TRUE FROM u""",
        "doc_stats": quality,
        "mirror_hosts": """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS did, text FROM documents),
pg AS (
  SELECT 'h' || CAST(did % 23 AS VARCHAR) || '.test' AS host, md5(text) AS fp FROM d
  UNION ALL
  SELECT 'm' || CAST(did % 23 AS VARCHAR) || '.test', md5(text) FROM d WHERE did % 2 = 0
  UNION ALL
  SELECT 'h' || CAST(i AS VARCHAR) || '.test', md5('BOILERPLATE FOOTER') FROM range(23) t(i)
  UNION ALL
  SELECT 'm' || CAST(i AS VARCHAR) || '.test', md5('BOILERPLATE FOOTER') FROM range(23) t(i)
),
hf AS (SELECT DISTINCT host, fp FROM pg),
keepfp AS (SELECT fp FROM hf GROUP BY fp HAVING COUNT(*) <= 10),
k AS (SELECT hf.host, hf.fp FROM hf JOIN keepfp USING (fp)),
sz AS (SELECT host, COUNT(*) AS sz FROM k GROUP BY host),
pr AS (SELECT a.host AS host_a, b.host AS host_b, CAST(COUNT(*) AS BIGINT) AS shared
       FROM k a JOIN k b ON a.fp = b.fp AND a.host < b.host
       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT host_a, host_b, shared,
  CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
  CAST(FLOOR((shared * 1000.0) / LEAST(sa.sz, sb.sz)) AS BIGINT) AS overlap_permille
FROM pr JOIN sz sa ON sa.host = pr.host_a JOIN sz sb ON sb.host = pr.host_b""",
        "dedup_exact_md5": """
SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY 1""",
        "corpus_prep": f"""
WITH t AS (SELECT doc_id, lang, text, {TOKS} AS toks FROM documents),
b AS (SELECT doc_id, lang, text,
  length(text) AS n_chars, len(toks) AS n_tokens,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
  len(list_filter(toks, x -> list_contains({stop['en']}, x))) AS stop_hits
FROM t),
r AS (SELECT doc_id, lang, text, n_tokens,
  LEAST(n_tokens / 100.0, 1.0) * 0.4
  + CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END * 0.3
  + LEAST(CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.2
  + (1.0 - LEAST(CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END * 10.0, 1.0)) * 0.1
    AS score
FROM b),
surv AS (SELECT * FROM r WHERE score >= 0.5),
keep AS (SELECT MIN(doc_id) AS doc_id FROM surv GROUP BY md5(text)),
samp AS (
  SELECT s.* FROM surv s JOIN keep k ON k.doc_id = s.doc_id
  WHERE CAST('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000000
        < CASE s.lang WHEN 'en' THEN 400000 WHEN 'de' THEN 800000 ELSE 600000 END
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM samp GROUP BY lang""",
        "near_dup_clusters": f"""
WITH RECURSIVE t0 AS (SELECT doc_id, {TOKS} AS toks FROM documents),
t AS (SELECT doc_id, {shingles} AS sh FROM t0 WHERE len(toks) >= 3),
sig AS (SELECT doc_id,
  [list_aggregate(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || ' ' || s)), 'min')
   for i in range(0, 8)] AS mhs FROM t),
bands AS (
  SELECT doc_id, band, md5(mhs[band * 2 + 1] || '|' || mhs[band * 2 + 2]) AS bh
  FROM sig CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS band)
),
roots AS (SELECT band, bh, MIN(doc_id) AS root FROM bands GROUP BY band, bh),
star AS (SELECT DISTINCT r.root AS src, b.doc_id AS dst
         FROM bands b JOIN roots r ON r.band = b.band AND r.bh = b.bh
         WHERE b.doc_id <> r.root),
jac AS (SELECT s.src, s.dst,
        len(list_intersect(ta.sh, tb.sh)) AS inter, len(ta.sh) AS sa, len(tb.sh) AS sb
        FROM star s JOIN t ta ON ta.doc_id = s.src JOIN t tb ON tb.doc_id = s.dst),
ver AS (SELECT src, dst FROM jac WHERE inter / (sa + sb - inter) >= 0.2),
und AS (SELECT src, dst FROM ver UNION SELECT dst, src FROM ver),
v AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
reach(id, lbl) AS (
  SELECT id, id FROM v
  UNION
  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
)
SELECT id AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster FROM reach GROUP BY id""",
        "minhash_candidates": f"""
WITH t0 AS (SELECT doc_id, {TOKS} AS toks FROM documents),
t AS (SELECT doc_id, {shingles} AS sh FROM t0 WHERE len(toks) >= 3),
sig AS (SELECT doc_id,
  [list_aggregate(list_transform(sh, s -> md5(CAST(i AS VARCHAR) || ' ' || s)), 'min')
   for i in range(0, 8)] AS mhs FROM t),
bands AS (
  SELECT doc_id, band, md5(mhs[band * 2 + 1] || '|' || mhs[band * 2 + 2]) AS bh
  FROM sig CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS band)
),
sized AS (SELECT doc_id, band, bh, COUNT(*) OVER (PARTITION BY band, bh) AS bsz FROM bands),
-- degenerate-bucket cap+chain (cap=2, window=1), replaying the Spark side
small AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sized a JOIN sized b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
          WHERE a.bsz <= 2),
rk AS (SELECT doc_id, band, bh,
         ROW_NUMBER() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rk
       FROM sized WHERE bsz > 2),
big AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM rk a JOIN rk b ON a.band = b.band AND a.bh = b.bh
          AND b.rk > a.rk AND b.rk <= a.rk + 1)
SELECT DISTINCT id_a, id_b
FROM (SELECT * FROM small UNION ALL SELECT * FROM big)""",
        "jaccard_pairs": f"""
WITH t0 AS (SELECT doc_id, {TOKS} AS toks FROM documents),
t AS (SELECT doc_id, {shingles} AS sh FROM t0 WHERE len(toks) >= 3),
ex0 AS (SELECT doc_id, UNNEST(sh) AS s FROM t),
keep AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) <= 50),
ex AS (SELECT ex0.* FROM ex0 JOIN keep ON keep.s = ex0.s),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b, n / (sa.sz + sb.sz - n) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE n / (sa.sz + sb.sz - n) >= 0.2""",
        "simhash_pairs": f"""
WITH t0 AS (SELECT doc_id AS id, {TOKS} AS toks FROM documents),
tk AS (SELECT id, unnest(toks) AS tok FROM t0),
tf AS (SELECT id, tok, COUNT(*) AS w FROM tk GROUP BY id, tok),
th AS (SELECT id, CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS h, w FROM tf),
bits AS (SELECT id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS s
         FROM th CROSS JOIN (SELECT unnest(range(48)) AS b) GROUP BY id, b),
sig AS (SELECT id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY id),
ch AS (SELECT id, sh, c, (sh >> (16 * c)) & 65535 AS cv
       FROM sig CROSS JOIN (SELECT unnest([0, 1, 2]) AS c)),
sized AS (SELECT id, sh, c, cv, COUNT(*) OVER (PARTITION BY c, cv) AS bsz FROM ch),
-- degenerate-bucket cap+chain (cap=16, window=4), replaying the Spark side
small AS (SELECT a.id AS id_a, b.id AS id_b, a.sh AS sa, b.sh AS sb
          FROM sized a JOIN sized b
            ON b.c = a.c AND b.cv = a.cv AND a.id < b.id
          WHERE a.bsz <= 16),
rk AS (SELECT id, sh, c, cv,
         ROW_NUMBER() OVER (PARTITION BY c, cv ORDER BY id) AS rk
       FROM sized WHERE bsz > 16),
big AS (SELECT a.id AS id_a, b.id AS id_b, a.sh AS sa, b.sh AS sb
        FROM rk a JOIN rk b ON b.c = a.c AND b.cv = a.cv
          AND b.rk > a.rk AND b.rk <= a.rk + 4),
cand AS (SELECT DISTINCT id_a, id_b, sa, sb
         FROM (SELECT * FROM small UNION ALL SELECT * FROM big))
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 8""",
        "embedding_near_dup_pairs": """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_dot_product(a.e, b.e)
        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
SELECT id_a, id_b FROM p WHERE cos >= 0.4""",
        "cosine_topk_ids": """
WITH p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pe FROM embeddings WHERE vec_id < 5),
s AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
        list_dot_product(c.embedding::DOUBLE[], p.pe)
        / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
           * sqrt(list_dot_product(p.pe, p.pe))) AS cos
      FROM embeddings c, p WHERE c.vec_id <> p.probe_id),
r AS (SELECT probe_id, neighbor_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM s)
SELECT probe_id, neighbor_id, rank FROM r WHERE rank <= 5""",
        "media_features": """
WITH m AS (SELECT range AS media_id, 'blob:' || sha256(CAST(range AS VARCHAR)) AS p
           FROM range(200)),
-- audio oracle: replay synth_wav's PCM formula (16-bit mono, 512
-- samples at 8000 Hz) and recompute the integer stats wav_features
-- must extract by actually parsing the RIFF container
pcm AS (SELECT m2.range AS media_id,
               ((m2.range * 1000003 + i.range * 7919) % 65536) - 32768 AS s
        FROM range(200) m2, range(512) i),
wav AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS wav_n_samples,
               CAST((COUNT(*) * 1000) // 8000 AS BIGINT) AS wav_duration_ms,
               CAST(MAX(ABS(s)) AS BIGINT) AS wav_peak,
               CAST(SUM(s * s) AS BIGINT) AS wav_sum_sq
        FROM pcm GROUP BY media_id)
SELECT m.media_id, CAST(length(p) AS BIGINT) AS n_bytes,
  CAST(list_sum([ascii(substr(p, i, 1)) for i in range(1, 17)]) AS BIGINT) AS feat_byte_sum,
  wav.wav_n_samples, wav.wav_duration_ms, wav.wav_peak, wav.wav_sum_sq
FROM m JOIN wav ON m.media_id = wav.media_id""",
        "event_daily_windows": """
SELECT CAST(ts AS DATE) AS day, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""",
        "user_event_stats": """
WITH top AS (
  SELECT user_id, event_id AS top_event_id FROM (
    SELECT user_id, event_id,
      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
    FROM events) WHERE rn = 1),
agg AS (
  SELECT user_id, COUNT(*) AS n_events,
    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events GROUP BY user_id)
SELECT agg.user_id, n_events, sum_value_cents, n_types, top_event_id
FROM agg JOIN top ON top.user_id = agg.user_id""",
        "segment_revenue": """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",
        "nation_revenue": """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_lineitems,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
    AS revenue_cbp
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name""",
    }
