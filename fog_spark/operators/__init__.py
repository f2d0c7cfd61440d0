from fog_spark.operators.dedup import (  # noqa: F401
    dedup_near,
    exact_dedup,
    jaccard_on_pairs,
    lsh_star_edges,
    minhash_signatures,
    minhash_lsh_candidates,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
    shingle_col,
    tokenize_col,
)
from fog_spark.operators.similarity import cosine_topk, lsh_ann_topk  # noqa: F401
from fog_spark.operators.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count_col,
)
from fog_spark.operators.anchortext import anchor_text_rollup  # noqa: F401
from fog_spark.operators.hostgraph import (  # noqa: F401
    host_graph,
    host_link_counts,
    host_of,
    host_pagerank_milli,
    host_spam_mass,
)
from fog_spark.operators.crawl import (  # noqa: F401
    crawl_frontier,
    trap_candidates,
    url_template,
)
from fog_spark.operators.node2vec import node2vec_walks  # noqa: F401
from fog_spark.operators.snapshots import (  # noqa: F401
    edge_delta,
    edge_delta_stats,
    latest_snapshots,
    page_change_stats,
)
from fog_spark.operators.linededup import (  # noqa: F401
    frequent_lines,
    line_df,
    remove_duplicated_lines,
)
from fog_spark.operators.mirrors import host_fingerprints, mirror_hosts  # noqa: F401
from fog_spark.operators.winnow import winnow_fingerprints, winnow_overlap_pairs  # noqa: F401
from fog_spark.operators.projection import co_project  # noqa: F401
from fog_spark.operators.robots import frontier_allowed, parse_robots  # noqa: F401
from fog_spark.operators.sitemaps import parse_sitemaps, sitemap_frontier_seeds  # noqa: F401
from fog_spark.operators.sampling import sample_neighbors, stratified_sample  # noqa: F401
from fog_spark.operators.walks import random_walks  # noqa: F401
