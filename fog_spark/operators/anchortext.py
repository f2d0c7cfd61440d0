"""Anchor-text aggregation over the crawl link graph.

Anchor text is the classic web-scale relevance signal: the words other
pages use when linking to a URL describe it better than its own markup
(the signal behind early web search ranking and a standard feature in
web-corpus training pipelines). This rolls the per-link (dst_url,
anchor) stream from functions/urlnorm.page_links into one row per
target URL with total inlink count, anchor diversity, and the top-k
anchors.

Scale shape (100 TB): per-(dst_url, anchor) counts first — a hash
aggregation with map-side combine, so the shuffle carries distinct
(url, anchor-string) pairs, not one row per link. The top-k pick is a
row_number window over those pre-aggregated rows partitioned by
dst_url; a hub URL's partition holds its *distinct anchors* (bounded in
practice — anchor vocabulary saturates), and Spark's window sort spills
rather than OOMs on degenerate cases. The final collect_list is capped
at k rows per URL by the preceding filter, so output rows are bounded.
Ties break (count desc, anchor asc) — fully deterministic, and
collect_list nondeterminism is neutralized by sorting on the carried
row_number before projecting the anchor strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fog_spark.functions.urlnorm import page_links


def anchor_text_rollup(
    pages: DataFrame, k: int = 3, follow_only: bool = True
) -> DataFrame:
    """(dst_url, n_refs, n_anchors, top_anchors: array<string>) per
    linked-to URL. Links whose anchor text is empty/whitespace are
    dropped up front (they carry no signal); ``n_refs`` counts the
    remaining links, ``n_anchors`` the distinct anchor strings,
    ``top_anchors`` the k most frequent (count desc, anchor asc)."""
    links = page_links(pages, follow_only=follow_only)
    ac = (
        links.where(F.trim(F.col("anchor")) != "")
        .groupBy("dst_url", "anchor")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("dst_url")
    ranked = ac.select(
        "dst_url",
        "anchor",
        F.row_number()
        .over(w.orderBy(F.col("cnt").desc(), F.col("anchor").asc()))
        .alias("rn"),
        F.sum("cnt").over(w).alias("n_refs"),
        F.count("*").over(w).alias("n_anchors"),
    )
    return (
        ranked.where(F.col("rn") <= k)
        .groupBy("dst_url")
        .agg(
            F.first("n_refs").alias("n_refs"),
            F.first("n_anchors").alias("n_anchors"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "anchor"))),
                lambda s: s["anchor"],
            ).alias("top_anchors"),
        )
    )
