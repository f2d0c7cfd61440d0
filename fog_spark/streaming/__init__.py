from fog_spark.streaming.ingest import stream_edges_from_pages, streaming_degrees  # noqa: F401
