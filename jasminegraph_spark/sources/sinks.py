"""Export sinks (reference SURVEY §2.5).

| reference | here |
|---|---|
| query rows as JSON lines to the client socket (CypherQueryExecutor.cpp:320-348) | to_json_rows / write_json_rows |
| `sdhdfs` export graph to HDFS (send_edges_to_hdfs_command)                      | export_edge_list / export_wire_jsonl (path may be hdfs:// or s3://) |
| degree-distribution TSV files `<g>_idd_<p>`                                     | DataFrame.write.csv(sep='\\t') at call sites |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jasminegraph_spark.graph import PropertyGraph


def to_json_rows(df: DataFrame):
    """Stream results as JSON strings — the engine-side equivalent of the
    reference's socket row protocol; an iterator so the driver never holds
    the full result."""
    out = df.select(F.to_json(F.struct(*df.columns)).alias("j"))
    return (r["j"] for r in out.toLocalIterator())


def write_json_rows(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def export_edge_list(graph: PropertyGraph, path: str, sep: str = " ") -> None:
    """`sdhdfs`-style plain src/dst edge list export."""
    graph.edges.select(F.concat_ws(sep, "src", "dst").alias("value")).write.mode(
        "overwrite"
    ).text(path)


def export_wire_jsonl(graph: PropertyGraph, path: str) -> None:
    """Export the graph in the Kafka edge wire format (round-trips through
    sources.read_property_graph_jsonl)."""
    n = graph.nodes.select(
        F.col("id").alias("nid"),
        F.map_concat(
            F.coalesce("properties", F.create_map().cast("map<string,string>")),
            F.when(
                F.col("label").isNotNull(), F.create_map(F.lit("label"), F.col("label"))
            ).otherwise(F.create_map().cast("map<string,string>")),
        ).alias("nprops"),
    )
    e = graph.edges
    wire = (
        e.join(n.withColumnRenamed("nid", "src"), "src")
        .withColumnRenamed("nprops", "src_props")
        .join(n.withColumnRenamed("nid", "dst"), "dst")
        .withColumnRenamed("nprops", "dst_props")
        .select(
            F.struct(F.col("src").alias("id"), F.col("src_props").alias("properties")).alias(
                "source"
            ),
            F.struct(F.col("dst").alias("id"), F.col("dst_props").alias("properties")).alias(
                "destination"
            ),
            F.map_concat(
                F.coalesce("properties", F.create_map().cast("map<string,string>")),
                F.when(
                    F.col("type").isNotNull(), F.create_map(F.lit("type"), F.col("type"))
                ).otherwise(F.create_map().cast("map<string,string>")),
            ).alias("properties"),
        )
    )
    wire.write.mode("overwrite").json(path)
