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


def export_graphml(graph: PropertyGraph, path: str) -> None:
    """GraphML export (the lingua franca of Gephi/NetworkX/igraph): the
    node and edge XML fragments are rendered DISTRIBUTED as one text
    part-file set each under ``path`` (header + nodes + edges + footer,
    readable by concatenating in name order — the standard
    multi-part-export convention). Properties ride along as a JSON
    attribute per element; XML-escaping is a Catalyst expression chain,
    so nothing funnels through the driver at any corpus size."""
    import os

    def esc(c):
        out = F.coalesce(c.cast("string"), F.lit(""))
        for raw, rep in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
            out = F.replace(out, F.lit(raw), F.lit(rep))
        return out

    nodes = graph.nodes.select(
        F.concat(
            F.lit('    <node id="'), esc(F.col("id")),
            F.lit('"><data key="label">'), esc(F.col("label")),
            F.lit('</data><data key="props">'), esc(F.to_json(F.col("properties"))),
            F.lit("</data></node>"),
        ).alias("value")
    )
    edges = graph.edges.select(
        F.concat(
            F.lit('    <edge source="'), esc(F.col("src")),
            F.lit('" target="'), esc(F.col("dst")),
            F.lit('"><data key="type">'), esc(F.col("type")),
            F.lit("</data></edge>"),
        ).alias("value")
    )
    nodes.write.mode("overwrite").text(os.path.join(path, "10_nodes"))
    edges.write.mode("overwrite").text(os.path.join(path, "20_edges"))
    header = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
        '  <key id="label" for="node" attr.name="label" attr.type="string"/>\n'
        '  <key id="props" for="node" attr.name="props" attr.type="string"/>\n'
        '  <key id="type" for="edge" attr.name="type" attr.type="string"/>\n'
        f'  <graph id="{graph.name or "g"}" edgedefault='
        f'"{"directed" if graph.is_directed else "undirected"}">\n'
    )
    footer = "  </graph>\n</graphml>\n"
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "00_header.xml"), "w") as f:
        f.write(header)
    with open(os.path.join(path, "99_footer.xml"), "w") as f:
        f.write(footer)


def assemble_graphml(path: str) -> str:
    """Concatenate a multi-part GraphML export into one XML string
    (test/tooling helper for small graphs — at scale consumers stream
    the parts in name order instead)."""
    import os

    chunks = []
    for root, _, files in sorted(os.walk(path)):
        for fname in sorted(files):
            if fname.endswith(".crc") or fname.startswith(("_", ".")):
                continue
            fp = os.path.join(root, fname)
            with open(fp) as f:
                content = f.read()
            if content:
                chunks.append((fp, content))
    chunks.sort(key=lambda t: t[0])
    return "".join(c for _, c in chunks)
