from fog_spark.sources.pages import generate_pages, generate_edges  # noqa: F401
from fog_spark.sources.tables import load_table, edges_from_orders  # noqa: F401
from fog_spark.sources.warc import read_warc, write_warc  # noqa: F401
from fog_spark.sources.edgelist import (  # noqa: F401
    read_adjlist,
    read_edgelist,
    with_hash_weights,
    write_adjlist,
    write_edgelist,
)
from fog_spark.sources.fogbin import (  # noqa: F401
    read_fog_desc,
    read_fog_graph,
    write_fog_binary,
)
