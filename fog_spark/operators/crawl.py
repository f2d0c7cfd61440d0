"""Crawl-frontier prioritization over Common-Crawl-style pages.

The reason a crawler ranks hosts (operators/hostgraph.py) is to decide
what to fetch next. This composes the pieces into that queue: every
canonical URL that the crawl links to but does not contain, scored by
the PageRank of its host and how often the crawl references it, with an
optional per-host cap (the politeness/diversity constraint real
schedulers apply).

Scale shape: link extraction + one per-dst_url hash aggregation
(map-side combine) + a left-anti join against the crawled url set
(both sides shuffle on url — no broadcast assumption; the crawl is the
big table) + a broadcast join against the host-rank dimension (hosts
are ~4 orders smaller than pages). The per-host cap is a row_number
window over rows already reduced to one per candidate URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fog_spark.functions.urlnorm import page_links
from fog_spark.operators.hostgraph import host_graph, host_of
from fog_spark.operators.robots import MAX_CRAWL_DELAY_S


def crawl_frontier(
    pages: DataFrame,
    niters: int = 8,
    per_host_cap: int | None = None,
    resolve: bool = True,
    robots_rules: DataFrame | None = None,
    redirects: DataFrame | None = None,
    redirect_max_hops: int = 16,
) -> DataFrame:
    """(dst_url, host, n_refs, host_rank_milli) for every kept link
    target absent from the crawl. The priority order is
    (host_rank_milli desc, n_refs desc, dst_url asc); ``per_host_cap``
    keeps only the top-k candidates per host under that order, but the
    RETURNED frame is in shuffle order — a consumer taking the global
    top-N must apply that orderBy itself (a full sort of the frontier
    is deliberately not forced on callers who write or cap it instead).
    ``resolve=False`` trusts hrefs to be absolute and canonical
    (fixture pages); real HTML wants the default. ``robots_rules``: a
    (host, allow, prefix) frame from operators/robots.parse_robots —
    candidates a wildcard-agent rule disallows are removed BEFORE the
    per-host cap, so a blocked url never displaces a fetchable one.
    ``redirects``: a (url, target) redirect/canonical map
    (operators/redirects) — link targets AND crawled urls are rewritten
    to their terminal before the anti-join, so an alias of an
    already-crawled page never re-enters the queue and aliases of one
    uncrawled page merge their n_refs instead of competing as separate
    candidates. The resolved map stays cached for the frontier's lazy
    consumers (redirect-map-sized)."""
    from fog_spark.algos import WeightedPageRankMilli
    from fog_spark.plans.engine import ScatterGatherEngine

    if resolve:
        links = page_links(pages, follow_only=True).select("url", "dst_url")
    else:
        from fog_spark.functions.extract import extract_outlinks_col

        links = pages.select(
            "url",
            F.explode(extract_outlinks_col(F.col("html"))).alias("dst_url"),
        )
    # the crawled-url side must live in the same namespace as the
    # (canonicalized) link targets, or already-crawled pages whose
    # stored spelling differs (uppercase host, explicit default port)
    # re-enter the frontier
    if resolve:
        from fog_spark.functions.urlnorm import canonicalize_url

        crawled = pages.select(
            canonicalize_url(F.col("url")).alias("dst_url")
        )
    else:
        crawled = pages.select(F.col("url").alias("dst_url"))
    if redirects is not None:
        from fog_spark.operators.redirects import resolve_redirects, rewrite_links

        resolution = resolve_redirects(redirects, max_hops=redirect_max_hops)
        links = rewrite_links(links, resolution, url_col="dst_url")
        crawled = rewrite_links(crawled, resolution, url_col="dst_url")
    candidates = (
        links.join(crawled, "dst_url", "left_anti")
        .groupBy("dst_url")
        .agg(F.count("*").alias("n_refs"))
        .withColumn("host", host_of(F.col("dst_url")))
    )
    # host ranks from the same pages table (one extraction pass of its
    # own inside host_graph; callers holding a pre-built host graph can
    # inline this composition themselves)
    from fog_spark.plans.materialize import Materializer

    M = Materializer(pages.sparkSession)
    dim, edges = host_graph(pages, resolve=resolve, materializer=M)
    eng = ScatterGatherEngine(pages.sparkSession, checkpoint_dir=None, collect_lineage=False)
    res = eng.run(WeightedPageRankMilli(niters=niters), edges)
    # host_rank is host-sized: checkpoint it eagerly so the engine state
    # and the link-count cache can be reclaimed NOW — the returned
    # frontier frame is lazy (crawl-sized; callers cap/write it) and must
    # not depend on freed blocks
    host_rank = M.checkpoint(
        dim.join(res.state, dim["id"] == res.state["id"]).select(
            "host", "rank_milli"
        )
    )
    eng.mat.free(res.state)
    M.free(edges)
    M.free(dim)
    if robots_rules is not None:
        from fog_spark.operators.robots import frontier_allowed

        candidates = (
            frontier_allowed(
                candidates.withColumnRenamed("dst_url", "url"), robots_rules
            )
            .where(F.col("allowed"))
            .drop("allowed")
            .withColumnRenamed("url", "dst_url")
        )
    out = candidates.join(F.broadcast(host_rank), "host", "left").select(
        "dst_url",
        "host",
        "n_refs",
        F.coalesce(F.col("rank_milli"), F.lit(0)).alias("host_rank_milli"),
    )
    if per_host_cap is not None:
        w = Window.partitionBy("host").orderBy(
            F.col("host_rank_milli").desc(),
            F.col("n_refs").desc(),
            F.col("dst_url").asc(),
        )
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= per_host_cap)
            .drop("_rn")
        )
    return out


def frontier_plan(
    pages: DataFrame,
    robots_rules: DataFrame | None = None,
    sitemaps: DataFrame | None = None,
    niters: int = 8,
    per_host_cap: int | None = None,
    trap_min_urls: int | None = None,
    resolve: bool = True,
    redirects: DataFrame | None = None,
    redirect_max_hops: int = 16,
) -> DataFrame:
    """The full fetch-queue plan a crawl scheduler runs, composed
    end-to-end from the pieces this package ships separately:

    1. :func:`crawl_frontier` — link targets absent from the crawl,
       scored by host PageRank and reference count, robots-filtered
       (``robots_rules`` = parse_robots output) before the per-host cap;
    2. :func:`sitemap_frontier_seeds` union — pages the sites themselves
       declare (``sitemaps`` = (sitemap_url, body) frame); seeds bypass
       the inlink ranking (n_refs/host_rank_milli = 0) but NOT robots —
       politeness is a MUST-NOT regardless of how a url was found. Seeds
       already planned as link candidates are dropped (one anti-join);
    3. :func:`trap_candidates` subtraction — URL templates with
       ``trap_min_urls``+ distinct candidates (calendar/session/facet
       traps) are removed from the final queue, sitemap seeds included
       (a trap reached via sitemap is still a trap).

    Returns ``(url, host, n_refs, host_rank_milli, via)`` with via in
    {'link', 'sitemap'}, unordered (consumers cap/sort/write it).

    Scale shape: the pieces' own shapes compose — crawl-sized frames
    only ever equi-join or anti-join; robots rules and the flagged trap
    templates are broadcast dims; no new shuffle beyond the pieces'.
    The composed DAG references the link plan at up to four places
    (union + seeds anti-join + trap aggregation + final anti-join), and
    Spark does not dedupe common DataFrame subtrees — so the plan is
    eagerly checkpointed at each reuse point (Materializer, the
    crawl_frontier host_rank idiom) instead of re-running the HTML link
    extraction, crawled anti-join, and robots groupBy per reference;
    earlier checkpoints are freed once a later one supersedes them."""
    from fog_spark.plans.materialize import Materializer

    M: Materializer | None = None

    def _ck(df: DataFrame) -> DataFrame:
        nonlocal M
        if M is None:
            M = Materializer(pages.sparkSession)
        return M.checkpoint(df)

    # ``redirects`` reaches only the link-candidate leg: sitemap seeds
    # are fetched as the site declared them (their redirects are
    # discovered at fetch time), so seed spellings stay untouched
    fr = crawl_frontier(
        pages, niters=niters, per_host_cap=per_host_cap,
        resolve=resolve, robots_rules=robots_rules, redirects=redirects,
        redirect_max_hops=redirect_max_hops,
    )
    plan = fr.select(
        F.col("dst_url").alias("url"), "host", "n_refs", "host_rank_milli",
        F.lit("link").alias("via"),
    )
    if sitemaps is not None:
        from fog_spark.operators.sitemaps import sitemap_frontier_seeds

        plan = _ck(plan)  # referenced by the seeds anti-join AND the union
        link_ck = plan
        # raw spellings suffice: sitemap_frontier_seeds canonicalizes
        # BOTH its sides itself (sitemaps.py), so pre-canonicalizing here
        # would just run the regex pass over the crawl twice
        seeds = sitemap_frontier_seeds(
            sitemaps, pages.select("url")
        ).select("url", "host")
        if robots_rules is not None:
            from fog_spark.operators.robots import frontier_allowed

            seeds = (
                frontier_allowed(seeds, robots_rules)
                .where(F.col("allowed"))
                .drop("allowed")
            )
        seeds = seeds.join(plan.select("url"), "url", "left_anti").select(
            "url", "host",
            F.lit(0).cast("long").alias("n_refs"),
            F.lit(0).cast("long").alias("host_rank_milli"),
            F.lit("sitemap").alias("via"),
        )
        plan = plan.unionByName(seeds)
    if trap_min_urls is not None:
        plan = _ck(plan)  # referenced by the trap agg AND the final anti-join
        if sitemaps is not None and M is not None:
            M.free(link_ck)  # superseded: the new checkpoint embeds its rows
        traps = trap_candidates(plan, url_col="url", min_urls=trap_min_urls)
        plan = (
            plan.withColumn("_tpl", url_template(F.col("url")))
            .join(
                F.broadcast(traps.select(F.col("template").alias("_tpl"))),
                "_tpl",
                "left_anti",
            )
            .drop("_tpl")
        )
    return plan


def url_template(url: Column) -> Column:
    """Structural template of a canonical URL: the host VERBATIM plus
    the path/query shape with digit runs collapsed to 'N', long (8+)
    hex runs to 'H', and query VALUES dropped (keys kept). Pages
    generated from one route ('/post/123', '/post/124', ...) share a
    template; numbered HOSTS (cdn1/cdn2 mirror shards) deliberately do
    NOT merge — a trap verdict must stay per-host, or subtracting a
    flagged template drops every numbered mirror's content at once."""
    hostless = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    t = F.regexp_replace(hostless, r"(?<==)[^&#]*", "")  # query values
    t = F.regexp_replace(t, r"[0-9a-fA-F]{8,}", "H")     # hex/uuid-ish runs
    t = F.regexp_replace(t, r"[0-9]+", "N")
    return F.concat(host, t)


def trap_candidates(
    candidate_urls: DataFrame,
    url_col: str = "dst_url",
    min_urls: int = 1000,
) -> DataFrame:
    """(template, n_urls, sample_url) for URL templates with at least
    ``min_urls`` DISTINCT candidates — the crawler-trap signal
    (calendar pages, session ids, faceted search: one route generating
    an unbounded URL space). Feed it the frontier (or any url column)
    and subtract matching templates from the fetch queue.

    One hash aggregation keyed by (template, url) for the exact distinct
    count, then one by template — both map-side combinable; sample_url =
    min(url) keeps the output deterministic."""
    u = F.col(url_col)
    per = (
        candidate_urls.select(url_template(u).alias("template"), u.alias("_u"))
        .distinct()
        .groupBy("template")
        .agg(F.count("*").alias("n_urls"), F.min("_u").alias("sample_url"))
    )
    return per.where(F.col("n_urls") >= min_urls)


# The untrusted Crawl-delay clamp MAX_CRAWL_DELAY_S now lives in
# operators/robots.py (imported above): values come from arbitrary
# robots.txt bodies, and an absurd one ('Crawl-delay: 1e18') would
# overflow the ms cast / the offset multiply under ANSI and kill the
# whole scheduling job. schedule_fetches keeps its own clamp as
# defense-in-depth for delay frames built outside crawl_delays.


def schedule_fetches(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    default_delay_s: float = 1.0,
    url_col: str = "dst_url",
    keep_cols: bool = False,
) -> DataFrame:
    """(url, host, fetch_offset_ms) — turn a ranked frontier into a
    dispatchable per-host fetch timeline: the i-th url of a host (under
    the frontier's priority order: host_rank_milli desc, n_refs desc,
    url asc) fetches at offset ``i * delay`` so no host is hit faster
    than its ``Crawl-delay`` (operators/robots.crawl_delays; hosts
    absent from ``delays`` use ``default_delay_s``). Offsets are exact
    integer milliseconds (delay rounds to ms once), so the timeline is
    engine-independent and a dispatcher can shard it by offset range.
    Delays clamp to [0, MAX_CRAWL_DELAY_S] — hostile robots values must
    not abort the job, and NULL, NaN or negative rows fall through to
    the default rather than the clamp ceiling — and dedup per host
    defensively (largest wins) even though crawl_delays already emits
    one valid row per host.

    ``keep_cols=True`` returns ALL frontier columns + fetch_offset_ms
    instead — use it to annotate a frontier in place: the offset rides
    the same window pass, so there is NO self-join of the (expensive,
    lazy) frontier subtree against itself.

    Shape: one broadcast join (delays is host-sized) + one window per
    host. The window sorts each host's candidates in one task — run it
    AFTER crawl_frontier's per_host_cap (or frontier_plan), which
    bounds every host to a constant number of rows; an uncapped
    mega-host would hot-spot here exactly like the cap window itself.
    """
    cols = frontier.columns
    order = [
        F.col(c).desc() for c in ("host_rank_milli", "n_refs") if c in cols
    ] + [F.col(url_col).asc()]
    f = frontier
    if delays is not None:
        # invalid rows (NULL, NaN, negative) are dropped BEFORE the
        # per-host max: F.max orders NaN above every number, so one NaN
        # row would otherwise mask a host's valid delay and drop it to
        # the default (review finding) — filtering first keeps the
        # largest VALID delay, and a host with only invalid rows simply
        # falls through the left join to the default. The post-agg
        # guard stays as belt-and-braces (F.least alone would turn NULL
        # into the MAX — skipping nulls — and pass negatives through).
        v = F.col("delay_s")
        ds = F.col("_ds")
        bounded = F.when(
            ds.isNotNull() & ~F.isnan(ds) & (ds >= 0),
            F.least(ds, F.lit(MAX_CRAWL_DELAY_S)),
        )
        d = (
            delays.where(v.isNotNull() & ~F.isnan(v) & (v >= 0))
            .groupBy(F.col("host").alias("_dh"))
            .agg(F.max("delay_s").alias("_ds"))
            .select("_dh", F.round(bounded * 1000).cast("long").alias("_dms"))
        )
        f = f.join(F.broadcast(d), f["host"] == d["_dh"], "left").drop("_dh")
    else:
        f = f.withColumn("_dms", F.lit(None).cast("long"))
    default_ms = int(
        round(min(max(default_delay_s, 0.0), MAX_CRAWL_DELAY_S) * 1000)
    )
    delay_ms = F.coalesce(F.col("_dms"), F.lit(default_ms))
    w = Window.partitionBy("host").orderBy(*order)
    ranked = f.withColumn(
        "fetch_offset_ms", (F.row_number().over(w) - 1) * delay_ms
    ).drop("_dms")
    if keep_cols:
        return ranked
    return ranked.select(
        F.col(url_col).alias("url"), "host", "fetch_offset_ms"
    )
