"""Host-level (domain) graph rollup over Common-Crawl-style pages.

The page-level link graph is the engine's native input (BASELINE.json
input_hint); the standard first analysis over a crawl is the HOST graph:
collapse every page to its URL host and aggregate link counts between
hosts. Hosts are ~4 orders of magnitude fewer than pages (10^8 vs 10^12
at crawl scale), so the rollup is the gateway from the trillion-row edge
table to interactively-sized graph analytics — host PageRank is the
classic crawl-prioritization signal.

Scale shape: one explode over outlinks + one (src_host, dst_host) hash
aggregation — map-side combine collapses the (page x page) multigraph to
host pairs before the exchange, so the shuffle carries at most
(distinct host pairs per partition), not one row per link. Dense host
ids come from assign_dense_ids (range-partition + local rank + driver
prefix-sum over P counts — no global window). All JVM-side Column
expressions; the only joins are against the host dimension, which is
tiny relative to the edge table and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fog_spark.functions.extract import assign_dense_ids, extract_outlinks_col


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute URL, as a pure Column expression
    (regexp, not parse_url, so the same pattern ports to the ANSI-SQL
    oracles and to engines without Hive UDFs). Empty string for
    non-absolute inputs."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )


def host_link_counts(pages: DataFrame, resolve: bool = False) -> DataFrame:
    """(src_host, dst_host, n_links) — the aggregated host multigraph,
    straight off the pages table. Self-host links (site-internal
    navigation) are kept; callers filter if they want the cross-host
    graph only. ``resolve`` routes extraction through
    urlnorm.page_links (relative hrefs resolved, nofollow dropped) —
    required on real crawl HTML where most hrefs are relative; the raw
    default matches the absolute-href fixture pages."""
    if resolve:
        from fog_spark.functions.urlnorm import page_links

        linked = page_links(pages, follow_only=True).select(
            host_of(F.col("url")).alias("src_host"), "dst_url"
        )
    else:
        linked = pages.select(
            host_of(F.col("url")).alias("src_host"),
            F.explode(extract_outlinks_col(F.col("html"))).alias("dst_url"),
        )
    return (
        linked.select("src_host", host_of(F.col("dst_url")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_graph(
    pages: DataFrame, resolve: bool = False, materializer=None
) -> tuple[DataFrame, DataFrame]:
    """(host_dim, edges): dense-id host dimension ``(host, id)`` and a
    weighted edge table ``(src, dst, weight=n_links)`` ready for any
    fog_spark algorithm (engine, cc_star, walks, ...).

    ``materializer``: a plans.materialize.Materializer. When given, the
    internal link-count cache is an eager checkpoint whose blocks the
    caller reclaims with ``materializer.free(edges)`` (the edge frame is
    tagged as the owner) once every consumer has materialized —
    host_pagerank_milli / crawl_frontier do this. When omitted the cache
    is a plain ``persist`` that lives until the session ends (fine for
    one-shot CLI runs; repeated library calls should pass a
    materializer)."""
    # counts is consumed three times (two host-union scans + the edge
    # join); cache it or each consumer re-runs the whole extraction
    # lineage — with resolve=True that lineage is ~10x the raw scan
    # (measured 107 s vs 21 s at 1M docs). The aggregated multigraph is
    # tiny (distinct host pairs), so the cache is cheap.
    counts = host_link_counts(pages, resolve=resolve)
    counts = (
        materializer.checkpoint(counts) if materializer is not None
        else counts.persist()
    )
    hosts = (
        counts.select(F.col("src_host").alias("host"))
        .union(counts.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    dim = assign_dense_ids(hosts, col="host", materializer=materializer)
    edges = (
        counts.join(
            F.broadcast(dim.select(F.col("host").alias("src_host"), F.col("id").alias("src"))),
            "src_host",
        )
        .join(
            F.broadcast(dim.select(F.col("host").alias("dst_host"), F.col("id").alias("dst"))),
            "dst_host",
        )
        .select("src", "dst", F.col("n_links").cast("double").alias("weight"))
    )
    if materializer is not None:
        edges = materializer.adopt(edges, counts)
    return dim, edges


def host_pagerank_milli(
    spark, pages: DataFrame, niters: int = 8, resolve: bool = False
) -> DataFrame:
    """(host, rank_milli): weight-proportional PageRank over the host
    graph — rank mass flows in proportion to inter-host link counts (the
    crawl-prioritization signal). Integer-milli arithmetic, so results
    are bit-stable across partitionings."""
    from fog_spark.algos import WeightedPageRankMilli
    from fog_spark.plans.engine import ScatterGatherEngine
    from fog_spark.plans.materialize import Materializer

    M = Materializer(spark)
    dim, edges = host_graph(pages, resolve=resolve, materializer=M)
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    res = eng.run(WeightedPageRankMilli(niters=niters), edges)
    # materialize the host-sized result eagerly, then reclaim every
    # intermediate cache (engine state + link-count checkpoint) — callers
    # keep only one small frame instead of a per-call cache leak
    out = M.checkpoint(
        res.state.join(F.broadcast(dim), res.state["id"] == dim["id"])
        .select("host", "rank_milli")
    )
    eng.mat.free(res.state)
    M.free(edges)
    M.free(dim)
    return out


def host_spam_mass(
    spark,
    pages: DataFrame,
    trust_hosts: list[str] | tuple[str, ...],
    niters: int = 8,
    resolve: bool = False,
) -> DataFrame:
    """(host, pr_milli, trust_milli, spam_permille): spam mass computed
    where spam detection actually operates — the HOST graph (Gyongyi et
    al. seed trusted SITES, not pages). Trusted hosts are named by
    string; hosts absent from the graph are ignored (a warning-free
    no-op, the whitelist shape). Same reclaim discipline as
    host_pagerank_milli: one host-sized output frame survives."""
    from fog_spark.algos.spam import spam_mass_milli
    from fog_spark.plans.engine import ScatterGatherEngine
    from fog_spark.plans.materialize import Materializer

    if not trust_hosts:
        raise ValueError("trust_hosts must be non-empty")
    M = Materializer(spark)
    dim, edges = host_graph(pages, resolve=resolve, materializer=M)
    # host_of lowercases every host — fold the seed list the same way or
    # a mixed-case whitelist entry silently drops out of the trust core
    wanted = [h.lower() for h in trust_hosts]
    seeds = [
        int(r["id"])
        for r in dim.where(F.col("host").isin(wanted)).collect()
    ]
    if not seeds:
        M.free(edges)
        raise ValueError("none of trust_hosts appear in the host graph")
    eng = ScatterGatherEngine(spark, checkpoint_dir=None, collect_lineage=False)
    sm = spam_mass_milli(
        spark, edges, trust_seeds=seeds, niters=niters, engine=eng, materializer=M
    )
    out = M.checkpoint(
        sm.join(F.broadcast(dim), sm["id"] == dim["id"])
        .select("host", "pr_milli", "trust_milli", "spam_permille")
    )
    M.free(sm)
    M.free(edges)
    M.free(dim)
    return out
