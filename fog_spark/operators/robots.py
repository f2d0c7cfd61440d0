"""robots.txt parsing + crawl-frontier politeness filtering.

The missing half of a real frontier: `operators/crawl.crawl_frontier`
ranks what to fetch; this module removes what MUST NOT be fetched. Not
in the reference (graph algorithms only); semantics follow RFC 9309:

- group = consecutive ``User-agent`` lines followed by Allow / Disallow
  rules; a crawler picks the group(s) whose user-agent token equals its
  own product token (case-insensitive exact match, §2.2.1); the ``*``
  group applies ONLY when no named group matched — including when the
  named group is empty (empty matching group = allow-all, NOT fallback).
- rule values support ``*`` (any char run) and a TRAILING ``$``
  (end-of-path anchor, §2.2.3); a mid-pattern ``$`` is literal.
- most-specific match wins: longest rule value (octets of the pattern,
  §2.2.2); Allow wins a length tie; no matching rule means allowed;
  empty rule values contribute nothing.

Percent-encoding equivalence (§2.2.2): both rule values and URL paths
are normalized before matching — ``%XX`` triplets decoding to an
unreserved octet (ALPHA / DIGIT / ``-._~``) become the literal char,
all other valid triplets get uppercase hex, a bare ``%`` stays literal
— so ``/a%3cd.html`` matches ``/a%3Cd.html`` and ``/f%7Eb`` matches
``/f~b`` while reserved octets (``%2F``) stay encoded and distinct
from their literal form, per the RFC. canonicalize_url upstream
handles the usual casing/port forms.

Scale shape: parsing is a per-row line fold over each robots body (pure
Column math; robots files are a few hundred lines). The frontier filter
joins candidate urls to the per-host rule table — hosts are ~4 orders
of magnitude fewer than urls and each host's rule set is tiny, so the
rules side BROADCASTS (rule->regex translation happens once per rule on
that side, not per url); the match + longest-prefix resolution is one
groupBy over (row key, matched rules). No Python in either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fog_spark.operators.hostgraph import host_of


def _group_fold(body_col: str, agent: str | None, payload):
    """The ONE RFC 9309 agent-group-selection fold, shared by every
    directive collector (parse_robots, crawl_delays) so group semantics
    can never diverge between them — the group-boundary fix had to be
    applied twice when they were separate copies.

    Fold state: star/named = the current group names ``*`` / our agent;
    in_agents = still inside the group's User-agent header block
    (consecutive User-agent lines extend ONE group; ANY other directive
    closes it — a Crawl-delay between two UA lines splits them into
    separate groups); has_named = ANY group in the file named our agent.
    EVERY directive line is kept (k != ''): non-collected kinds still
    close the header block, they just contribute nothing.

    ``payload`` = list of (name, zero Column, step fn(acc, s) -> Column)
    collected fields; the User-agent branch carries them through
    unchanged. Returns the final fold struct (star, named, in_agents,
    has_named, + payload fields)."""
    agent_lit = F.lit((agent or "").lower())
    lines = F.transform(
        F.split(F.col(body_col), r"\r?\n"),
        lambda ln: F.trim(F.regexp_replace(ln, r"#.*$", "")),
    )
    parsed = F.filter(
        F.transform(
            lines,
            lambda ln: F.struct(
                F.lower(F.trim(F.regexp_extract(ln, r"^([^:]+):", 1))).alias("k"),
                F.trim(F.regexp_extract(ln, r"^[^:]+:(.*)$", 1)).alias("v"),
            ),
        ),
        lambda s: s["k"] != "",
    )
    if agent is None:
        is_named = lambda v: F.lit(False)  # noqa: E731
    else:
        is_named = lambda v: F.lower(v) == agent_lit  # noqa: E731

    def step(acc, s):
        ua = F.struct(
            F.when(acc["in_agents"], acc["star"] | (s["v"] == "*"))
            .otherwise(s["v"] == "*")
            .alias("star"),
            F.when(acc["in_agents"], acc["named"] | is_named(s["v"]))
            .otherwise(is_named(s["v"]))
            .alias("named"),
            F.lit(True).alias("in_agents"),
            (acc["has_named"] | is_named(s["v"])).alias("has_named"),
            *[acc[n].alias(n) for n, _z, _f in payload],
        )
        other = F.struct(
            acc["star"].alias("star"),
            acc["named"].alias("named"),
            F.lit(False).alias("in_agents"),
            acc["has_named"].alias("has_named"),
            *[fn(acc, s).alias(n) for n, _z, fn in payload],
        )
        return F.when(s["k"] == "user-agent", ua).otherwise(other)

    zero = F.struct(
        F.lit(False).alias("star"),
        F.lit(False).alias("named"),
        F.lit(False).alias("in_agents"),
        F.lit(False).alias("has_named"),
        *[z.alias(n) for n, z, _f in payload],
    )
    return F.aggregate(parsed, zero, step)


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body",
    agent: str | None = None,
) -> DataFrame:
    """(host, allow:boolean, prefix) — the effective rules of each
    robots.txt body for ``agent`` (a product token, e.g. "fetchbot");
    ``agent=None`` honors only the wildcard group. Lines are trimmed,
    ``#`` comments stripped, directive names case-folded. Groups naming
    the agent take precedence over the ``*`` group per RFC 9309 — a
    present-but-empty named group yields NO rules (allow-all) rather
    than falling back to ``*``. ``prefix`` is the raw rule value,
    wildcards included; :func:`frontier_allowed` interprets them."""
    rule = lambda s: F.struct(  # noqa: E731
        (s["k"] == "allow").alias("allow"), s["v"].alias("prefix")
    )

    def rules_step(side):
        def f(acc, s):
            return F.when(
                s["k"].isin("allow", "disallow")
                & acc[side]
                & (F.length(s["v"]) > 0),
                F.array_append(acc[f"{side}_rules"], rule(s)),
            ).otherwise(acc[f"{side}_rules"])

        return f

    empty = F.array().cast("array<struct<allow:boolean,prefix:string>>")
    acc = _group_fold(
        body_col,
        agent,
        [
            ("star_rules", empty, rules_step("star")),
            ("named_rules", empty, rules_step("named")),
        ],
    )
    rules = F.when(acc["has_named"], acc["named_rules"]).otherwise(acc["star_rules"])
    return robots.select(
        F.col(host_col).alias("host"), F.explode(rules).alias("r")
    ).select("host", "r.allow", "r.prefix")


def sitemap_urls(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) — ``Sitemap:`` directives from robots.txt
    bodies, the standard sitemap DISCOVERY channel (sitemaps.org
    protocol; RFC 9309 treats it as an "other record" living OUTSIDE
    user-agent groups, so every crawler sees it regardless of agent).
    Directive name is case-insensitive; values are absolute URLs and
    pass through untouched (the protocol requires absolute; a relative
    value is kept as-is for the caller to resolve or drop). Distinct
    per (host, url) — repeated declarations collapse.

    Composes the discovery chain end-to-end: ``sitemap_urls`` names
    what to fetch, the fetched (sitemap_url, body) rows feed
    operators/sitemaps.parse_sitemaps, whose url rows feed
    sitemap_frontier_seeds. Same per-row line-fold shape as
    parse_robots; one distinct shuffle on host-sized rows."""
    lines = F.transform(
        F.split(F.col(body_col), r"\r?\n"),
        lambda ln: F.trim(F.regexp_replace(ln, r"#.*$", "")),
    )
    urls = F.filter(
        F.transform(
            lines,
            lambda ln: F.when(
                F.lower(F.trim(F.regexp_extract(ln, r"^([^:]+):", 1)))
                == "sitemap",
                F.trim(F.regexp_extract(ln, r"^[^:]+:(.*)$", 1)),
            ).otherwise(F.lit("")),
        ),
        lambda v: v != "",
    )
    return (
        robots.select(
            F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url")
        )
        .distinct()
    )


def _pct_normalize(s: Column) -> Column:
    """RFC 9309 §2.2.2 percent-encoding normalization, pure Column math:
    each valid ``%XX`` triplet either decodes (unreserved octets:
    ALPHA / DIGIT / ``-._~`` — encoding them never changes meaning) or
    has its hex digits uppercased (reserved/other octets keep their
    encoded spelling, e.g. ``%2F`` stays distinct from ``/``); a ``%``
    not opening a valid triplet is literal. Applying the same map to
    rule values and URL paths makes matching spelling-insensitive."""
    toks = F.regexp_extract_all(s, F.lit("(%[0-9A-Fa-f]{2}|%|[^%]+)"), 1)
    def norm(t: Column) -> Column:
        hexpair = F.upper(F.substring(t, 2, 2))
        code = F.conv(hexpair, 16, 10).cast("int")
        unreserved = (
            code.between(48, 57)   # 0-9
            | code.between(65, 90)  # A-Z
            | code.between(97, 122)  # a-z
            | code.isin(45, 46, 95, 126)  # - . _ ~
        )
        return F.when(
            t.rlike("^%[0-9A-Fa-f]{2}$"),
            F.when(unreserved, F.char(code)).otherwise(F.concat(F.lit("%"), hexpair)),
        ).otherwise(t)
    return F.array_join(F.transform(toks, norm), "")


def _pattern_regex(pattern: Column) -> Column:
    """RFC 9309 rule value -> anchored Java regex: ``*`` matches any char
    run, a TRAILING ``$`` anchors at end-of-path (mid-pattern ``$`` is a
    literal), everything else is literal."""
    esc = F.regexp_replace(pattern, r"([.\[\]{}()+?^\\|$])", r"\\$1")
    body = F.regexp_replace(esc, r"\*", ".*")
    # a trailing $ was escaped to \$ (2 chars) — swap it for the anchor
    anchored = F.concat(F.substr(body, F.lit(1), F.length(body) - 2), F.lit("$"))
    return F.concat(
        F.lit("^"), F.when(pattern.endswith("$"), anchored).otherwise(body)
    )


def frontier_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Input urls plus an ``allowed`` boolean: the longest matching rule
    value decides (RFC 9309 most-specific match, wildcards expanded via
    :func:`_pattern_regex`), Allow wins ties, no matching rule (or no
    rules for the host at all) means allowed. The rule table broadcasts —
    it is host-sized, the url side is crawl-sized. Rows are keyed by a
    generated id, so duplicate input rows survive and input column names
    never collide with the rule table's (``_rid``/``_host``/``_path`` and
    ``_r``-prefixed names are reserved)."""
    u = (
        urls.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("_host", host_of(F.col(url_col)))
        .withColumn(
            "_path",
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)?$", 1
                    ),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
        )
    )
    # percent-normalize BOTH sides so rule-vs-path matching is spelling-
    # insensitive (§2.2.2); rule lengths (most-specific precedence) are
    # measured on the same canonical octets the match runs on
    u = u.withColumn("_path", _pct_normalize(F.col("_path")))
    norm_prefix = _pct_normalize(F.col("prefix"))
    r = F.broadcast(
        rules.select(
            F.col("host").alias("_host"),
            F.col("allow").alias("_r_allow"),
            F.length(norm_prefix).alias("_r_len"),
            _pattern_regex(norm_prefix).alias("_r_rx"),
        )
    )
    matched = (
        u.join(r, "_host", "left")
        .withColumn(
            "_m", F.col("_r_rx").isNotNull() & F.rlike(F.col("_path"), F.col("_r_rx"))
        )
        .groupBy("_rid")
        .agg(
            *[F.first(c).alias(c) for c in urls.columns],
            F.max(F.when(F.col("_m") & ~F.col("_r_allow"), F.col("_r_len"))).alias("_dis"),
            F.max(F.when(F.col("_m") & F.col("_r_allow"), F.col("_r_len"))).alias("_alw"),
        )
    )
    return matched.select(
        *urls.columns,
        (
            F.col("_dis").isNull()
            | (F.coalesce(F.col("_alw"), F.lit(-1)) >= F.col("_dis"))
        ).alias("allowed"),
    )


# hostile robots values must never dictate the fetch timeline: delays
# clamp here at the source, so EVERY consumer of crawl_delays (not just
# schedule_fetches) sees [0, MAX_CRAWL_DELAY_S]
MAX_CRAWL_DELAY_S = 3600.0


def crawl_delays(
    robots: DataFrame, host_col: str = "host", body_col: str = "body",
    agent: str | None = None,
) -> DataFrame:
    """(host, delay_s:double) — the effective ``Crawl-delay`` of each
    robots.txt for ``agent``. Group selection mirrors parse_robots: a
    group naming the agent REPLACES the ``*`` group entirely (so a
    named group WITHOUT a Crawl-delay line means no delay, not the
    ``*`` group's); within the selected scope the LAST VALID delay line
    wins (files repeating the directive mean the later one). Non-numeric,
    NaN AND negative values are ignored — they never overwrite an earlier
    valid delay ("Crawl-delay: NaN" try_casts to a double NaN which Spark
    orders above 0, so NaN needs its own guard). Hosts without an
    effective delay are absent — callers coalesce a default. Fractional
    values ("0.5") are legal and common. Output is one row per host
    (duplicate robots captures keep the politest = largest delay),
    clamped to [0, MAX_CRAWL_DELAY_S] so hostile magnitudes (1e18,
    "Infinity") never reach a consumer unclamped. Same per-row line-fold
    shape as parse_robots."""
    def delay_step(side):
        def f(acc, s):
            # a non-numeric, NaN or negative value is IGNORED (never
            # overwrites an earlier valid delay); NULL >= 0 is NULL,
            # which F.when treats as false, but NaN >= 0 is TRUE under
            # Spark's NaN-is-largest ordering, hence the isnan guard
            v = s["v"].try_cast("double")
            return F.when(
                (s["k"] == "crawl-delay")
                & acc[side]
                & ~F.isnan(v)
                & (v >= 0),
                v,
            ).otherwise(acc[f"{side}_delay"])

        return f

    nod = F.lit(None).cast("double")
    acc = _group_fold(
        body_col,
        agent,
        [
            ("star_delay", nod, delay_step("star")),
            ("named_delay", nod, delay_step("named")),
        ],
    )
    delay = F.when(acc["has_named"], acc["named_delay"]).otherwise(acc["star_delay"])
    return (
        robots.select(F.col(host_col).alias("host"), delay.alias("delay_s"))
        .where(F.col("delay_s").isNotNull() & (F.col("delay_s") >= 0))
        # multi-capture robots tables carry the same host twice: keep the
        # politest (largest) declared delay so a duplicate host can never
        # multiply rows through the scheduler's join
        .groupBy("host")
        .agg(
            F.least(F.max("delay_s"), F.lit(MAX_CRAWL_DELAY_S)).alias("delay_s")
        )
    )
