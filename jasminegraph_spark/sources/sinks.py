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


def reference_rows(df: DataFrame, k_partitions: int = 2):
    """Result-shape fidelity mode: rows formatted like the reference's
    client protocol — one JSON object per row, node variables rendered as
    their property map with an injected ``partitionID``
    (src/query/processor/cypher/runtime/Helpers.cpp:563 writes the
    meta-property; OperatorExecutor.cpp:324-365 emits {var: {props…}}).

    Struct-typed columns (bound variables) become property objects with
    partitionID = hash(id) % k (the reference HASH partitioner,
    partitioner/stream/Partitioner.cpp:110-121); scalar columns pass
    through under their names.
    """
    import json as _json

    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() == "struct" and "properties" in f.dataType.fieldNames():
            pid = F.pmod(F.xxhash64(F.col(f"{f.name}.id")), F.lit(k_partitions)).cast("string")
            obj = F.map_concat(
                F.coalesce(
                    F.col(f"{f.name}.properties"),
                    F.create_map().cast("map<string,string>"),
                ),
                F.create_map(F.lit("partitionID"), pid),
            )
            cols.append(obj.alias(f.name))
        else:
            cols.append(F.col(f.name).cast("string").alias(f.name))
    out = df.select(*cols).select(F.to_json(F.struct("*")).alias("j"))
    for r in out.toLocalIterator():
        # round-trip so missing properties serialize as explicit nulls,
        # matching the reference's {"n.age": null} behavior
        yield _json.dumps(_json.loads(r["j"]), sort_keys=True)


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
