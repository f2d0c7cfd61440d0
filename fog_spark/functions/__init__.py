from fog_spark.functions.extract import (  # noqa: F401
    extract_text_col,
    extract_outlinks_col,
    extract_pages_udf,
    edges_from_pages,
    assign_dense_ids,
    fixture_page_ids,
)
from fog_spark.functions.urlnorm import (  # noqa: F401
    anchors_col,
    canonicalize_url,
    page_links,
    page_links_udf,
    resolve_href,
    strip_tracking_params,
)
