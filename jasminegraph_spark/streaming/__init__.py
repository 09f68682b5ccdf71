from jasminegraph_spark.streaming.ingest import (  # noqa: F401
    EdgeStreamIngest,
    StreamRegistry,
    new_triangle_delta,
    StreamingTriangleCounter,
)
