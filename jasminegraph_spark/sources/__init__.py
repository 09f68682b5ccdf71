from jasminegraph_spark.sources.readers import (  # noqa: F401
    read_edge_list,
    read_documents_jsonl,
    read_property_graph_jsonl,
    read_rdf_triples,
    read_edge_list_with_attributes,
    EDGE_WIRE_SCHEMA,
)
from jasminegraph_spark.sources.layout import compact_parquet, zorder_by  # noqa: F401,E501
from jasminegraph_spark.sources.sinks import (  # noqa: F401
    assemble_graphml,
    export_graphml,
)
