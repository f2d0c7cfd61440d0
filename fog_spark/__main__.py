"""Unified run CLI — the analog of the reference's ``fog`` binary
(``fog -g graph.desc -a pagerank --pagerank::niters 10``,
/root/reference/headers/options_utils.h:22-70), Spark-first::

    python -m fog_spark --algo pagerank --edges edges.parquet \
        --pagerank-niters 10 --output out/ --checkpoint ckpt/

Flag parity map (reference -> here): ``-g/--graph`` -> ``--edges`` +
``--format`` (the .desc/.edge/.index bundle is an edge table here);
``-a/--application`` -> ``--algo``; ``-p/--processors`` -> ``--cores``
(plus ``--shuffle-partitions``, the strip-count analog); ``-m/--memory``
-> Spark executor memory, not a CLI concern; ``--pagerank::niters`` ->
``--pagerank-niters``; ``--sssp::source`` -> ``--sssp-source``;
``--bfs::bfs-root`` -> ``--bfs-root``; ``-i/--in-edge`` is implicit
(each algorithm declares the adjacency direction it needs).

On a cluster the same module runs via
``spark-submit --py-files fog_spark.zip -m fog_spark ...`` — the session
factory only adds local[] defaults when no master is configured.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALGOS = (
    "pagerank",
    "pagerank-milli",
    "standard-pagerank",
    "cc",
    "cc-warm",
    "cc-star",
    "bfs",
    "sssp",
    "lpa",
    "scc",
    "msf",
    "triangles",
    "spmv",
    "ppr",
    "trustrank",
    "kcore",
    "stats",
    "wpagerank-milli",
    "hits",
    "salsa",
    "pagerank-warm",
    "edge-delta",
    "triangle-delta",
    "bowtie",
    "mis",
    "ktruss",
    "hyperball",
    "walks",
    "node2vec",
    "host-pagerank",
    "crawl-frontier",
    "coreness",
    "anchor-text",
    "effective-diameter",
    "spam-mass",
    "katz",
    "census",
    "resolve-redirects",
    "bm25",
    "frontier-plan",
    "recrawl-schedule",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m fog_spark",
        description="Link-graph analytics over an edge table (FOG, Spark-first).",
    )
    p.add_argument("--algo", "-a", required=True, choices=ALGOS)
    p.add_argument("--edges", "-g", required=True,
                   help="edge table path (parquet dir, SNAP edge-list/adj-list text, or pages parquet)")
    p.add_argument("--format", choices=("parquet", "edgelist", "adjlist", "fogbin", "pages", "warc", "warc-split"),
                   default="parquet")
    p.add_argument("--weighted", action="store_true",
                   help="edgelist only: parse a third weight column")
    p.add_argument("--anchor-topk", type=int, default=3,
                   help="anchor-text: keep the k most frequent anchors per url")
    p.add_argument("--frontier-cap", type=int, default=None,
                   help="crawl-frontier: keep at most this many candidate "
                        "urls per host")
    p.add_argument("--host-rollup", action="store_true",
                   help="pages format: collapse the page graph to the host "
                        "graph (dense host ids, n_links weights) and run the "
                        "chosen algorithm over it; output ids carry a host "
                        "column")
    p.add_argument("--collapse-snapshots", action="store_true",
                   help="pages format: keep only the latest capture per url "
                        "(by warc_ts) before extraction — the multi-capture "
                        "crawl-table shape")
    p.add_argument("--resolve-links", action="store_true",
                   help="pages format: resolve relative hrefs against the page "
                        "url, canonicalize (lowercase host, default ports, "
                        "dot-segments), drop rel=nofollow links")
    p.add_argument("--hash-weights", action="store_true",
                   help="attach deterministic hash weights (FIXTURES F2 rule)")
    p.add_argument("--output", "-o", default=None,
                   help="write the result DataFrame as parquet here; default prints 20 rows")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint/lineage/resume root (engine algorithms)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--cores", "-p", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--hub-cap", type=int, default=None,
                   help="salt adjacency rows above this out-degree (default engine setting)")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--pagerank-niters", type=int, default=10)
    p.add_argument("--warm-ranks", default=None,
                   help="parquet of (id, rank) from a previous standard-pagerank "
                        "run; required by --algo pagerank-warm")
    p.add_argument("--warm-labels", default=None,
                   help="parquet of (id, component) from a previous cc run; "
                        "required by --algo cc-warm (edge ADDITIONS only — "
                        "check edge-delta first). Optional --edges-added "
                        "narrows the initial frontier to the delta endpoints")
    p.add_argument("--edges-added", default=None,
                   help="parquet of added (src, dst) edges for --algo cc-warm")
    p.add_argument("--edges-old", default=None,
                   help="previous capture's edge parquet; required by "
                        "--algo edge-delta (diffs it against --edges)")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--sssp-source", type=int, default=0)
    p.add_argument("--bfs-root", type=int, default=0)
    p.add_argument("--lpa-iters", type=int, default=5)
    p.add_argument("--ppr-seed", type=int, default=0)
    p.add_argument("--trust-seeds", default="0",
                   help="trustrank: comma-separated trusted seed vertex ids")
    p.add_argument("--ppr-niters", type=int, default=8)
    p.add_argument("--kcore-k", type=int, default=3)
    p.add_argument("--kcore-rounds", type=int, default=16)
    p.add_argument("--hits-iters", type=int, default=4)
    p.add_argument("--mis-rounds", type=int, default=12)
    p.add_argument("--ktruss-k", type=int, default=3)
    p.add_argument("--ktruss-rounds", type=int, default=8)
    p.add_argument("--hyperball-m", type=int, default=16)
    p.add_argument("--hyperball-rounds", type=int, default=8)
    p.add_argument("--walk-len", type=int, default=8)
    p.add_argument("--node2vec-p", type=float, default=1.0)
    p.add_argument("--node2vec-q", type=float, default=1.0)
    p.add_argument("--redirect-max-hops", type=int, default=16,
                   help="resolve-redirects: chain-length cap (power of two)")
    p.add_argument("--robots", default=None,
                   help="frontier algos: parquet of (host, body) robots.txt rows")
    p.add_argument("--sitemaps", default=None,
                   help="frontier-plan: parquet of (sitemap_url, body) rows")
    p.add_argument("--redirects", default=None,
                   help="frontier algos: parquet of (url, target) redirect map "
                        "— aliases collapse before the crawled anti-join")
    p.add_argument("--trap-min-urls", type=int, default=None,
                   help="frontier-plan: flag URL templates with this many "
                        "distinct candidates as crawler traps")
    p.add_argument("--schedule", action="store_true",
                   help="frontier algos: append exact per-host fetch offsets "
                        "(Crawl-delay from --robots, else --default-delay)")
    p.add_argument("--default-delay", type=float, default=1.0,
                   help="--schedule: seconds between fetches for hosts "
                        "without a declared Crawl-delay")
    p.add_argument("--query", action="append", default=None,
                   help="bm25: keyword query (repeatable; one result set per query)")
    p.add_argument("--topk", type=int, default=10,
                   help="bm25: results per query")
    p.add_argument("--bm25-integer", action="store_true",
                   help="bm25: use the integer-micro scoring twin instead of "
                        "float BM25 (bit-reproducible across engines)")
    return p


def _make_cc_warm(spark: SparkSession, args: argparse.Namespace, edges: DataFrame):
    from fog_spark.algos.components import WarmStartCC

    prev = spark.read.parquet(
        args.warm_labels or _die("--algo cc-warm requires --warm-labels")
    ).select("id", "component")
    # warm-start hash-min is only sound for edge ADDITIONS: a deleted edge
    # can only RAISE a component label, which hash-min can never do from a
    # stale too-small warm label — the CLI would silently emit wrong
    # components. With --edges-old we can verify the contract cheaply
    # (one anti-join count); without it we can only warn (ADVICE r03).
    if args.edges_old:
        from fog_spark.operators.snapshots import edge_delta

        deleted = (
            edge_delta(spark.read.parquet(args.edges_old), edges)
            .where(F.col("change") == "removed")
            .count()
        )
        if deleted > 0:
            raise SystemExit(
                f"--algo cc-warm: {deleted} edge(s) were DELETED since "
                "--edges-old; warm-start hash-min is additions-only (a "
                "deletion can split a component, which a warm label can "
                "never raise). Run --algo cc cold instead."
            )
    else:
        print(
            "cc-warm: additions-only contract UNVERIFIED (pass --edges-old "
            "to check via edge-delta); deleted edges would make warm-start "
            "labels silently wrong",
            file=sys.stderr,
        )
    added = (
        spark.read.parquet(args.edges_added).select("src", "dst")
        if args.edges_added
        else None
    )
    return WarmStartCC(prev, added_edges=added)


def _die(msg: str) -> str:
    raise SystemExit(msg)


def _check_max_hops(h: int) -> None:
    if h < 1 or (h & (h - 1)) != 0:
        raise SystemExit(
            f"--redirect-max-hops must be a power of two, got {h} "
            "(hop exactness of the doubling depends on it)"
        )


def _require_cols(df: DataFrame, cols: tuple[str, ...], what: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise SystemExit(
            f"{what} needs columns {cols}; missing {missing} "
            f"(found: {df.columns})"
        )


def _load_pages(spark: SparkSession, args: argparse.Namespace) -> DataFrame:
    if args.format == "warc":
        from fog_spark.sources.warc import read_warc

        pages = read_warc(spark, args.edges)
    elif args.format == "warc-split":
        # byte-range-parallel reader for few huge member-per-record
        # archives (sources/warc.read_warc_split); same rows as "warc"
        from fog_spark.sources.warc import read_warc_split

        pages = read_warc_split(spark, args.edges)
    else:
        pages = spark.read.parquet(args.edges)
    if args.collapse_snapshots:
        from fog_spark.operators.snapshots import latest_snapshots

        pages = latest_snapshots(pages)
    return pages


def load_edges(spark: SparkSession, args: argparse.Namespace) -> DataFrame:
    from fog_spark.sources.edgelist import read_adjlist, read_edgelist, with_hash_weights

    if args.format == "parquet":
        e = spark.read.parquet(args.edges)
    elif args.format == "edgelist":
        e = read_edgelist(spark, args.edges, weighted=args.weighted)
    elif args.format == "adjlist":
        e = read_adjlist(spark, args.edges)
    elif args.format == "fogbin":
        # the converter's binary CSR bundle: --edges points at the
        # .desc; validate guards against silently-truncated binaries
        from fog_spark.sources.fogbin import read_fog_graph

        e = read_fog_graph(spark, args.edges, validate=True)
    else:  # pages: extract outlinks from the html column (north-rule path)
        from fog_spark.functions.extract import edges_from_pages

        pages = _load_pages(spark, args)
        return edges_from_pages(
            pages, weighted=args.hash_weights, resolve=args.resolve_links
        )
    if args.hash_weights and "weight" not in e.columns:
        e = with_hash_weights(e)
    return e


def run(args: argparse.Namespace, spark: SparkSession) -> DataFrame:
    if args.algo == "host-pagerank":
        # full webtext pipeline: pages html -> outlinks -> host rollup ->
        # weighted host PageRank; wants the raw pages table, not edges
        from fog_spark.operators.hostgraph import host_pagerank_milli

        if args.format not in ("pages", "warc", "warc-split"):
            raise SystemExit("--algo host-pagerank requires --format pages|warc|warc-split")
        pages = _load_pages(spark, args)
        return host_pagerank_milli(
            spark, pages, niters=args.pagerank_niters, resolve=args.resolve_links
        )

    if args.algo == "anchor-text":
        # pages -> per-target inlink counts + top-k anchor texts
        from fog_spark.operators.anchortext import anchor_text_rollup

        if args.format not in ("pages", "warc", "warc-split"):
            raise SystemExit("--algo anchor-text requires --format pages|warc|warc-split")
        pages = _load_pages(spark, args)
        return anchor_text_rollup(pages, k=args.anchor_topk)

    if args.algo in ("crawl-frontier", "frontier-plan"):
        # pages -> the prioritized fetch queue (operators/crawl.py);
        # frontier-plan composes robots + sitemap seeds + trap
        # subtraction end-to-end
        from fog_spark.operators.crawl import crawl_frontier, frontier_plan

        if args.format not in ("pages", "warc", "warc-split"):
            raise SystemExit(
                f"--algo {args.algo} requires --format pages|warc|warc-split"
            )
        pages = _load_pages(spark, args)
        rules = None
        robots_df = None
        if args.robots:
            from fog_spark.operators.robots import parse_robots

            robots_df = spark.read.parquet(args.robots)
            _require_cols(robots_df, ("host", "body"), "--robots input")
            rules = parse_robots(robots_df)

        def _maybe_schedule(frontier, url_col):
            if not args.schedule:
                return frontier
            from fog_spark.operators.crawl import schedule_fetches
            from fog_spark.operators.robots import crawl_delays

            delays = crawl_delays(robots_df) if robots_df is not None else None
            # keep_cols annotates in place — no self-join of the lazy
            # frontier subtree (extraction/anti-join/robots would run 2x)
            return schedule_fetches(
                frontier, delays, default_delay_s=args.default_delay,
                url_col=url_col, keep_cols=True,
            )

        redirects = None
        if args.redirects:
            _check_max_hops(args.redirect_max_hops)
            redirects = spark.read.parquet(args.redirects)
            _require_cols(redirects, ("url", "target"), "--redirects input")
        if args.algo == "crawl-frontier":
            return _maybe_schedule(
                crawl_frontier(
                    pages,
                    niters=args.pagerank_niters,
                    per_host_cap=args.frontier_cap,
                    resolve=args.resolve_links,
                    robots_rules=rules,
                    redirects=redirects,
                    redirect_max_hops=args.redirect_max_hops,
                ),
                "dst_url",
            )
        sitemaps = None
        if args.sitemaps:
            sitemaps = spark.read.parquet(args.sitemaps)
            _require_cols(sitemaps, ("sitemap_url", "body"), "--sitemaps input")
        return _maybe_schedule(
            frontier_plan(
                pages,
                robots_rules=rules,
                sitemaps=sitemaps,
                niters=args.pagerank_niters,
                per_host_cap=args.frontier_cap,
                trap_min_urls=args.trap_min_urls,
                resolve=args.resolve_links,
                redirects=redirects,
                redirect_max_hops=args.redirect_max_hops,
            ),
            "url",
        )

    if args.algo == "recrawl-schedule":
        # multi-capture pages -> per-url revisit intervals
        from fog_spark.operators.snapshots import page_change_stats, recrawl_schedule

        if args.format not in ("pages", "warc", "warc-split"):
            raise SystemExit(
                "--algo recrawl-schedule requires --format pages|warc|warc-split"
            )
        if args.collapse_snapshots:
            raise SystemExit(
                "--algo recrawl-schedule needs the FULL capture history; "
                "drop --collapse-snapshots"
            )
        return recrawl_schedule(page_change_stats(_load_pages(spark, args)))

    if args.algo == "resolve-redirects":
        # redirect/canonical alias collapse (operators/redirects.py):
        # pages formats extract rel=canonical declarations; parquet input
        # is a (url, target) redirect table (e.g. from 3xx records)
        from fog_spark.operators.redirects import canonical_edges, resolve_redirects

        _check_max_hops(args.redirect_max_hops)
        if args.format in ("pages", "warc", "warc-split"):
            rmap = canonical_edges(_load_pages(spark, args))
        else:
            rmap = spark.read.parquet(args.edges)
            _require_cols(rmap, ("url", "target"), "--algo resolve-redirects input")
        return resolve_redirects(rmap, max_hops=args.redirect_max_hops)

    if args.algo == "bm25":
        # keyword retrieval over a documents parquet (doc_id, text)
        from fog_spark.operators.index import bm25_topk, bm25_topk_micro

        if not args.query:
            raise SystemExit("--algo bm25 requires at least one --query")
        docs = spark.read.parquet(args.edges)
        if "doc_id" not in docs.columns or "text" not in docs.columns:
            raise SystemExit("--algo bm25 input needs (doc_id, text) columns")
        fn = bm25_topk_micro if args.bm25_integer else bm25_topk
        return fn(docs, args.query, k=args.topk)

    dim = None
    if args.host_rollup:
        # run ANY algorithm over the host graph: pages -> host rollup ->
        # dense-id weighted edges; vertex ids in the output are joined
        # back to their host names
        from fog_spark.operators.hostgraph import host_graph

        if args.format not in ("pages", "warc", "warc-split"):
            raise SystemExit("--host-rollup requires --format pages|warc|warc-split")
        pages = _load_pages(spark, args)
        dim, e = host_graph(pages, resolve=args.resolve_links)
    else:
        e = load_edges(spark, args)
    out = _dispatch(args, spark, e)
    if dim is not None and "id" in out.columns:
        out = out.join(
            F.broadcast(dim.withColumnRenamed("id", "_hid")),
            F.col("id") == F.col("_hid"),
        ).drop("_hid")
    return out


def _dispatch(args: argparse.Namespace, spark: SparkSession, e: DataFrame) -> DataFrame:
    from fog_spark import graph as G
    from fog_spark.algos import (
        BFS,
        SSSP,
        ConnectedComponents,
        FogPageRank,
        FogPageRankMilli,
        KatzMilli,
        LabelPropagation,
        PPRMilli,
        StandardPageRank,
        TrustRankMilli,
        WarmStartPageRank,
        WeightedPageRankMilli,
        k_core,
        msf,
        scc,
        spmv,
        triangles,
    )
    from fog_spark.plans.engine import ScatterGatherEngine

    if args.algo == "stats":
        s = G.graph_stats(e)
        return spark.createDataFrame(
            [tuple(s.values())], ", ".join(f"{k} long" for k in s)
        )
    if args.algo == "census":
        # reciprocity + assortativity sums (graph.census_stats)
        return G.census_stats(e)
    if args.algo == "scc":
        return scc(e)
    if args.algo == "msf":
        return msf(e)
    if args.algo == "triangles":
        return triangles(e)
    if args.algo == "spmv":
        return spmv(e)
    if args.algo == "kcore":
        return k_core(e, k=args.kcore_k, max_rounds=args.kcore_rounds)
    if args.algo == "coreness":
        from fog_spark.algos.kcore import coreness

        return coreness(e, max_rounds=args.kcore_rounds)
    if args.algo == "effective-diameter":
        from fog_spark.algos.hyperball import effective_diameter

        d = effective_diameter(
            e, q=0.9, m=args.hyperball_m, max_rounds=args.hyperball_rounds
        )
        return spark.createDataFrame([(0.9, float(d))], "q double, effective_diameter double")
    if args.algo == "cc-star":
        from fog_spark.algos.cc_star import star_contraction_components

        return star_contraction_components(spark, e)
    if args.algo == "hits":
        from fog_spark.algos.hits import hits_milli

        return hits_milli(e, iters=args.hits_iters)
    if args.algo == "salsa":
        from fog_spark.algos.salsa import salsa_milli

        return salsa_milli(e, iters=args.hits_iters)
    if args.algo == "bowtie":
        from fog_spark.algos.bowtie import bowtie

        return bowtie(e)
    if args.algo == "spam-mass":
        from fog_spark.algos.spam import spam_mass_milli

        return spam_mass_milli(
            spark, e,
            trust_seeds=[int(s) for s in args.trust_seeds.split(",")],
            niters=args.ppr_niters,
        )
    if args.algo == "edge-delta":
        from fog_spark.operators.snapshots import edge_delta

        if not args.edges_old:
            raise SystemExit("--algo edge-delta requires --edges-old")
        return edge_delta(spark.read.parquet(args.edges_old), e)
    if args.algo == "triangle-delta":
        # incremental triangle-count delta from the edge delta alone
        from fog_spark.algos.triangles import triangle_delta

        if not args.edges_old:
            raise SystemExit("--algo triangle-delta requires --edges-old")
        return triangle_delta(spark.read.parquet(args.edges_old), e)
    if args.algo == "mis":
        from fog_spark.algos.mis import maximal_independent_set

        return maximal_independent_set(e, max_rounds=args.mis_rounds)
    if args.algo == "ktruss":
        from fog_spark.algos.ktruss import k_truss

        return k_truss(e, k=args.ktruss_k, max_rounds=args.ktruss_rounds)
    if args.algo == "hyperball":
        from fog_spark.algos.hyperball import hyperball_sketches

        return hyperball_sketches(
            e, m=args.hyperball_m, rounds=args.hyperball_rounds
        )
    if args.algo == "walks":
        from fog_spark.operators.walks import random_walks

        return random_walks(e, walk_len=args.walk_len)
    if args.algo == "node2vec":
        from fog_spark.operators.node2vec import node2vec_walks

        return node2vec_walks(
            e, walk_len=args.walk_len, p=args.node2vec_p, q=args.node2vec_q
        )

    algo = {
        "pagerank": lambda: FogPageRank(niters=args.pagerank_niters, damping=args.damping),
        "pagerank-milli": lambda: FogPageRankMilli(niters=args.pagerank_niters),
        "standard-pagerank": lambda: StandardPageRank(damping=args.damping),
        "pagerank-warm": lambda: WarmStartPageRank(
            spark.read.parquet(
                args.warm_ranks
                or _die("--algo pagerank-warm requires --warm-ranks")
            ).select("id", "rank"),
            damping=args.damping,
        ),
        "cc": ConnectedComponents,
        "cc-warm": lambda: _make_cc_warm(spark, args, e),
        "bfs": lambda: BFS(root=args.bfs_root),
        "sssp": lambda: SSSP(source=args.sssp_source),
        "lpa": lambda: LabelPropagation(max_iters=args.lpa_iters),
        "ppr": lambda: PPRMilli(seed=args.ppr_seed, niters=args.ppr_niters),
        "trustrank": lambda: TrustRankMilli(
            seeds=[int(s) for s in args.trust_seeds.split(",")],
            niters=args.ppr_niters,
        ),
        "wpagerank-milli": lambda: WeightedPageRankMilli(niters=args.pagerank_niters),
        "katz": lambda: KatzMilli(niters=args.pagerank_niters),
    }[args.algo]()
    kw = {}
    if args.hub_cap is not None:
        kw["hub_cap"] = args.hub_cap
    eng = ScatterGatherEngine(spark, checkpoint_dir=args.checkpoint, **kw)
    res = eng.run(
        algo,
        e,
        max_iters=args.max_iters,
        run_id=args.run_id,
        resume=not args.no_resume,
    )
    out = res.state
    return out.drop("_active") if "_active" in out.columns else out


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    if spark is None:
        from fog_spark.session import get_spark

        spark = get_spark(
            app_name=f"fog_spark:{args.algo}",
            cores=args.cores,
            shuffle_partitions=args.shuffle_partitions,
        )
    result = run(args, spark)
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        result.orderBy(*[F.col(c) for c in result.columns[:1]]).show(20, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
