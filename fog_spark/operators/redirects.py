"""Redirect-chain resolution + rel=canonical extraction — the URL
collapse a crawl runs BEFORE link analysis.

Real crawls record HTTP 3xx hops (url -> Location) and page-declared
``<link rel="canonical">`` targets; link analysis over the raw targets
splits one logical page's inlinks across its aliases. The fix is to
resolve every redirect source to its terminal target (bounded hops,
cycle-safe) and rewrite link destinations through that map. The
reference has no HTTP layer at all (its ingest starts at an edge list,
/root/reference/convert/process_edgelist.cpp:55-221); this is the
web-ingest extension the north rule's Common-Crawl shape needs.

Resolution is pointer doubling (the classic log-hop shortcut, same
device as the SCC pointer jumping in algos/scc.py): after round k every
chain has been shortcut 2^k hops, so ``ceil(log2(max_hops))`` self-joins
of the redirect-map-sized state replace ``max_hops`` sequential joins.
Browsers cap redirect chains (~20); ``max_hops`` is a power of two so
the doubled hop count is EXACT in both outcomes: a chain that reaches a
terminal within ``max_hops`` reports its true length, and a longer
chain or cycle reports the target at exactly ``max_hops`` hops with
``resolved = false`` — which is what a bounded sequential replay (the
DuckDB oracle, pytest oracle) computes too.

Scale shape: the state is redirect-map-sized (a fraction of the page
count, orders below the edge table); each round is one equi-self-join,
so the whole resolution is ~4 shuffles at max_hops=16. Rewriting links
is one left join + coalesce. No step is degree- or chain-quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one <link ...> element; rel/href attribute order varies in the wild.
# rel is a space-separated TOKEN LIST per the HTML spec (and search
# engines honor canonical anywhere in it), so the rel pattern accepts
# quoted lists containing the token as well as a bare unquoted value;
# href accepts quoted or unquoted (valid HTML) attribute values.
_LINK_TAG_RE = r"(?i)<link\b[^>]*>"
_REL_CANON_RE = (
    r"""(?i)\brel\s*=\s*("[^"]*\bcanonical\b[^"]*"|'[^']*\bcanonical\b[^']*'"""
    r"""|canonical(?=[\s/>]|$))"""
)
_HREF_Q_RE = r"""(?i)\bhref\s*=\s*["']([^"']*)["']"""
_HREF_U_RE = r"""(?i)\bhref\s*=\s*([^"'\s>][^\s>]*)"""


def collapse_redirect_map(
    redirects: DataFrame, src_col: str = "url", dst_col: str = "target"
) -> DataFrame:
    """Functional redirect map (url, target): self-redirects dropped,
    multi-capture conflicts collapsed to the smallest target (a pure
    deterministic tie-break — callers with timestamps should pre-collapse
    via operators.snapshots.latest_snapshots instead)."""
    return (
        redirects.select(
            F.col(src_col).cast("string").alias("url"),
            F.col(dst_col).cast("string").alias("target"),
        )
        .where(F.col("url") != F.col("target"))
        .where(F.col("url").isNotNull() & F.col("target").isNotNull())
        .groupBy("url")
        .agg(F.min("target").alias("target"))
    )


def resolve_redirects(redirects: DataFrame, max_hops: int = 16) -> DataFrame:
    """(url, final_url, hops, resolved) for every redirect source.

    ``resolved`` = a terminal (no outgoing redirect) was reached within
    ``max_hops``; then ``final_url`` is that terminal and ``hops`` the
    exact chain length. Otherwise (cycle, or chain longer than the cap)
    ``final_url`` is the target at exactly ``max_hops`` hops and
    ``hops = max_hops``. ``max_hops`` must be a power of two (hop
    exactness of the doubling depends on it). URLs that are not redirect
    sources are absent — callers left-join and coalesce (rewrite_links).
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    from fog_spark.plans.materialize import Materializer

    m = collapse_redirect_map(redirects)
    # each round self-joins the state, so an unmaterialized plan holds
    # TWO copies of the previous round's subtree — 2^rounds copies of
    # the base by the end (and re-inflates the inherited-Statistics
    # estimates the engine loop strips). Checkpoint the state per round,
    # exactly like plans/engine.py's iteration loop.
    M = Materializer(redirects.sparkSession)
    # done(url) = target has no outgoing redirect
    t = m.select(F.col("url").alias("_t"), F.col("target").alias("_tt"))
    state = M.checkpoint(
        m.join(t, m["target"] == t["_t"], "left").select(
            "url",
            "target",
            F.lit(1).cast("long").alias("hops"),
            F.col("_t").isNull().alias("done"),
        )
    )
    rounds = max(0, (max_hops - 1).bit_length())  # ceil(log2(max_hops))
    for _ in range(rounds):
        nxt = state.select(
            F.col("url").alias("_t"),
            F.col("target").alias("_tt"),
            F.col("hops").alias("_th"),
            F.col("done").alias("_td"),
        )
        # invariant: done == false implies target is a key of the map,
        # so the left join always matches for live rows; the isNull
        # branch is unreachable safety
        state = M.swap(
            state,
            state.join(nxt, state["target"] == nxt["_t"], "left").select(
                "url",
                F.when(F.col("done") | F.col("_t").isNull(), F.col("target"))
                .otherwise(F.col("_tt"))
                .alias("target"),
                F.when(F.col("done") | F.col("_t").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_th"))
                .alias("hops"),
                (F.col("done") | F.col("_t").isNull() | F.col("_td")).alias("done"),
            ),
        )
    # the result view owns the final round's cached blocks (adopt), so a
    # caller may Materializer-free it like any engine output
    return M.adopt(
        state.select(
            "url",
            F.col("target").alias("final_url"),
            "hops",
            F.col("done").alias("resolved"),
        ),
        state,
    )


def rewrite_links(
    links: DataFrame,
    resolution: DataFrame,
    url_col: str = "dst_url",
    resolved_only: bool = True,
) -> DataFrame:
    """Rewrite link targets through a resolve_redirects output: targets
    that are redirect sources become their terminal URL; everything else
    passes through. ``resolved_only`` leaves unresolved (cycle/overlong)
    targets untouched rather than pointing them mid-cycle. One left
    join + coalesce; the resolution side is page-sized, so AQE
    broadcasts it when small."""
    r = resolution
    if resolved_only:
        r = r.where(F.col("resolved"))
    r = r.select(
        F.col("url").alias("_ru"), F.col("final_url").alias("_rf")
    )
    out = links.join(r, links[url_col] == r["_ru"], "left")
    return out.withColumn(
        url_col, F.coalesce(F.col("_rf"), F.col(url_col))
    ).drop("_ru", "_rf")


def canonical_edges(pages: DataFrame) -> DataFrame:
    """(url, target) rel=canonical declarations — page-declared aliasing
    that composes with HTTP redirects in the same resolver.

    Extracts the FIRST ``<link rel="canonical" href=...>`` per page
    (browsers and search engines honor the first), resolves it against
    the page URL and canonicalizes (functions/urlnorm semantics), and
    drops self-canonical rows (the common "this page is canonical"
    declaration carries no aliasing). Resolution and canonicalization
    run as separate projections so neither helper's reused subtrees
    compose past the codegen method limit (see page_links' staging
    note, functions/urlnorm.py)."""
    from fog_spark.functions.urlnorm import canonicalize_url, resolve_href

    tags = pages.select(
        "url",
        F.regexp_extract_all(
            F.decode(F.col("html"), "UTF-8"), F.lit(_LINK_TAG_RE), F.lit(0)
        ).alias("_tags"),
    )
    # stage the filtered array before element access (lambda re-eval trap,
    # operators/winnow.py): filter once, then take element 0
    canon = tags.select(
        "url",
        F.filter(
            F.col("_tags"),
            lambda tg: F.regexp_extract(tg, _REL_CANON_RE, 0) != "",
        ).alias("_canon"),
    ).select(
        "url",
        # F.get is NULL on an empty array even under ANSI mode (where
        # element_at would throw INVALID_ARRAY_INDEX)
        F.get(F.col("_canon"), 0).alias("_tag"),
    ).select(
        "url",
        # quoted href wins; fall back to the unquoted form (the unquoted
        # pattern can't fire on a quoted value — its first char excludes
        # quotes — so the precedence is unambiguous)
        F.when(
            F.regexp_extract(F.col("_tag"), _HREF_Q_RE, 1) != "",
            F.regexp_extract(F.col("_tag"), _HREF_Q_RE, 1),
        )
        .otherwise(F.regexp_extract(F.col("_tag"), _HREF_U_RE, 1))
        .alias("_href"),
    ).where(F.col("_href").isNotNull() & (F.col("_href") != ""))
    resolved = canon.select(
        "url", resolve_href(F.col("url"), F.col("_href")).alias("_resolved")
    ).where(F.col("_resolved").isNotNull())
    return (
        resolved.select(
            "url", canonicalize_url(F.col("_resolved")).alias("target")
        )
        .where(F.col("url") != F.col("target"))
    )
