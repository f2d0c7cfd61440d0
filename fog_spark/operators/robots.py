"""robots.txt parsing + crawl-frontier politeness filtering.

The missing half of a real frontier: `operators/crawl.crawl_frontier`
ranks what to fetch; this module removes what MUST NOT be fetched. Not
in the reference (graph algorithms only); semantics follow the public
robots.txt convention (original 1994 REP + the parts of RFC 9309 that
matter for a filter): group = User-agent lines followed by Allow /
Disallow path prefixes, longest matching prefix wins, Allow wins a
length tie, empty Disallow means allow-all.

Deliberate simplifications (documented contract, mirrored by the pytest
oracle): only the wildcard agent group (``User-agent: *``) is honored —
per-bot groups need the crawler's identity, a config concern — and
prefixes are matched literally (no ``*`` / ``$`` wildcards; rules
containing ``*`` are dropped, ``$``-terminated rules are kept with the
``$`` stripped, both of which under-block rather than over-block —
wildcard support would move the rule into a regexp).

Scale shape: parsing is a per-row line fold over each robots body (pure
Column math; robots files are a few hundred lines). The frontier filter
joins candidate urls to the per-host rule table — hosts are ~4 orders
of magnitude fewer than urls and each host's rule set is tiny, so the
rules side BROADCASTS; the match + longest-prefix resolution is one
groupBy over (url, matched rules). No Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fog_spark.operators.hostgraph import host_of


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, allow:boolean, prefix) — the wildcard-agent rules of each
    robots.txt body. Lines are trimmed, ``#`` comments stripped,
    directive names case-folded; rules outside a ``User-agent: *`` group
    are ignored; ``Disallow:`` with an empty value contributes nothing
    (allow-all); rules containing ``*`` are dropped, a trailing ``$`` is
    stripped (see module contract)."""
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
        lambda s: s["k"].isin("user-agent", "allow", "disallow"),
    )
    # fold: in_star = current group names the wildcard agent; in_agents =
    # still inside the group's User-agent header block (consecutive
    # User-agent lines extend ONE group; a rule line closes the header)
    step = lambda acc, s: F.when(  # noqa: E731
        s["k"] == "user-agent",
        F.struct(
            F.when(acc["in_agents"], acc["in_star"] | (s["v"] == "*"))
            .otherwise(s["v"] == "*")
            .alias("in_star"),
            F.lit(True).alias("in_agents"),
            acc["rules"].alias("rules"),
        ),
    ).otherwise(
        F.struct(
            acc["in_star"].alias("in_star"),
            F.lit(False).alias("in_agents"),
            F.when(
                acc["in_star"] & (F.length(s["v"]) > 0) & ~s["v"].contains("*"),
                F.array_append(
                    acc["rules"],
                    F.struct(
                        (s["k"] == "allow").alias("allow"),
                        F.regexp_replace(s["v"], r"\$$", "").alias("prefix"),
                    ),
                ),
            )
            .otherwise(acc["rules"])
            .alias("rules"),
        )
    )
    zero = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(False).alias("in_agents"),
        F.array().cast("array<struct<allow:boolean,prefix:string>>").alias("rules"),
    )
    rules = F.aggregate(parsed, zero, step)["rules"]
    return robots.select(
        F.col(host_col).alias("host"), F.explode(rules).alias("r")
    ).select("host", "r.allow", "r.prefix")


def frontier_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Input urls plus an ``allowed`` boolean: longest matching rule
    prefix decides, Allow wins ties, no matching rule (or no rules for
    the host at all) means allowed. The rule table broadcasts — it is
    host-sized, the url side is crawl-sized."""
    u = urls.withColumn("_host", host_of(F.col(url_col))).withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)?$", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    r = F.broadcast(rules.select(F.col("host").alias("_host"), "allow", "prefix"))
    matched = (
        u.join(r, "_host", "left")
        .withColumn(
            "_m",
            F.col("prefix").isNotNull() & F.col("_path").startswith(F.col("prefix")),
        )
        .groupBy(*urls.columns)
        .agg(
            F.max(F.when(F.col("_m") & ~F.col("allow"), F.length("prefix"))).alias("_dis"),
            F.max(F.when(F.col("_m") & F.col("allow"), F.length("prefix"))).alias("_alw"),
        )
    )
    return matched.select(
        *urls.columns,
        (
            F.col("_dis").isNull()
            | (F.coalesce(F.col("_alw"), F.lit(-1)) >= F.col("_dis"))
        ).alias("allowed"),
    )
