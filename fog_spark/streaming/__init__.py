from fog_spark.streaming.dedup import (  # noqa: F401
    streaming_dedup_within_watermark,
    streaming_duplicate_counts,
)
from fog_spark.streaming.ingest import (  # noqa: F401
    stream_edges_from_pages,
    streaming_degrees,
    streaming_host_link_counts,
    streaming_host_link_windows,
)
