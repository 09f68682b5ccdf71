from jasminegraph_spark.sources.readers import (  # noqa: F401
    read_edge_list,
    read_documents_jsonl,
    read_property_graph_jsonl,
    read_rdf_triples,
    read_edge_list_with_attributes,
    read_graphml,
    EDGE_WIRE_SCHEMA,
)
from jasminegraph_spark.sources.layout import (  # noqa: F401
    compact_parquet,
    write_partitioned,
    zorder_by,
    zorder_prune_stats,
)
from jasminegraph_spark.sources.sinks import (  # noqa: F401
    assemble_graphml,
    export_graphml,
)
from jasminegraph_spark.sources.generators import (  # noqa: F401
    rmat_edges,
    synthetic_documents,
    uniform_edges,
)
