from jasminegraph_spark.streaming.ingest import (  # noqa: F401
    EdgeStreamIngest,
    StreamRegistry,
    kafka_edge_stream,
    new_triangle_delta,
    StreamingTriangleCounter,
)
from jasminegraph_spark.streaming.windows import (  # noqa: F401
    run_stream_to_batch,
    session_window_counts,
    stateful_user_counter,
    streaming_dedup,
    windowed_event_counts,
)
from jasminegraph_spark.streaming.partitioners import (  # noqa: F401
    hash_partition,
    ldg_partition,
    fennel_partition,
    community_partition,
    edge_cut_fraction,
    metis_partition,
    partition_quality_report,
    range_partition,
    refine_partition,
)
