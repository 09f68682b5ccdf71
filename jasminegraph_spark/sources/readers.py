"""Graph ingest sources (reference SURVEY §2.4).

| reference command | here |
|---|---|
| `adgr` edge-list upload (MetisPartitioner::loadDataSet)     | read_edge_list |
| `adgr-cust` graph + attribute files (JSONParser.cpp)        | read_edge_list_with_attributes |
| `adrdf` RDF triples (RDFParser.cpp)                         | read_rdf_triples |
| `adhdfs` HDFS edge-list/JSON (HDFSStreamHandler.cpp)        | same readers — Spark paths are URIs (hdfs://, s3://) |
| Kafka JSON edge wire format (StreamHandler.cpp:104-138)     | EDGE_WIRE_SCHEMA + read_property_graph_jsonl; streaming in jasminegraph_spark.streaming |

The reference partitions at ingest (METIS / hash / Fennel / LDG) and
splits local vs central edges; in Spark, partitioning is deferred to the
first shuffle and hash co-location makes the split unnecessary. A `pid`
column equivalent to the HASH partitioner is available via
PropertyGraph.with_pid().
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jasminegraph_spark.graph import PropertyGraph

# Kafka JSON edge wire format (StreamHandler.cpp:104-138; sample rows in
# tests/integration/env_init/data/graph_with_properties.txt)
EDGE_WIRE_SCHEMA = T.StructType(
    [
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "destination",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_edge_list(
    spark: SparkSession, path: str, name: str = "graph", is_directed: bool = False
) -> PropertyGraph:
    """Whitespace-separated `src dst` edge list (powergrid.dl style).

    Nodes are derived as the distinct endpoint set. One pass, two
    partial-agg shuffles; at 100 TB the text scan parallelizes per
    HDFS/object-store block like any Spark file source.
    """
    raw = spark.read.text(path)
    e = raw.select(F.split(F.trim(F.col("value")), r"\s+").alias("parts")).filter(
        F.size("parts") >= 2
    )
    edges = e.select(
        F.concat_ws("-", F.col("parts")[0], F.col("parts")[1]).alias("id"),
        F.col("parts")[0].alias("src"),
        F.col("parts")[1].alias("dst"),
        F.lit(None).cast("string").alias("type"),
        F.create_map().cast("map<string,string>").alias("properties"),
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select("dst"))
        .distinct()
        .select(
            "id",
            F.lit(None).cast("string").alias("label"),
            F.create_map().cast("map<string,string>").alias("properties"),
        )
    )
    return PropertyGraph(nodes=nodes, edges=edges, is_directed=is_directed, name=name)


def read_edge_list_with_attributes(
    spark: SparkSession,
    edge_path: str,
    attr_path: str,
    name: str = "graph",
    is_directed: bool = False,
) -> PropertyGraph:
    """`adgr-cust`: edge list + per-node attribute file
    (`node_id<TAB>f1 f2 f3...` — reference JSONParser/text feature format).
    Features land in properties["features"] as the raw string, mirroring
    the reference's space-separated feature storage (SURVEY §1.3)."""
    g = read_edge_list(spark, edge_path, name, is_directed)
    attrs = (
        spark.read.text(attr_path)
        .select(F.split(F.col("value"), r"\t|\s+", 2).alias("p"))
        .filter(F.size("p") >= 2)
        .select(F.col("p")[0].alias("id"), F.col("p")[1].alias("features"))
    )
    nodes = (
        g.nodes.join(attrs, "id", "left")
        .select(
            "id",
            "label",
            F.when(
                F.col("features").isNotNull(),
                F.map_concat("properties", F.create_map(F.lit("features"), F.col("features"))),
            )
            .otherwise(F.col("properties"))
            .alias("properties"),
        )
    )
    return PropertyGraph(nodes=nodes, edges=g.edges, is_directed=is_directed, name=name)


def read_rdf_triples(
    spark: SparkSession, path: str, name: str = "rdf", is_directed: bool = True
) -> PropertyGraph:
    """`adrdf`: whitespace-separated `subject predicate object` triples →
    property graph (subject/object nodes, predicate as edge type). The
    reference maps RDF into its store via RDFParser.cpp/RDFPartitioner.cpp."""
    raw = spark.read.text(path)
    t = raw.select(F.split(F.trim(F.col("value")), r"\s+").alias("p")).filter(F.size("p") >= 3)
    edges = t.select(
        F.concat_ws("|", F.col("p")[0], F.col("p")[1], F.col("p")[2]).alias("id"),
        F.col("p")[0].alias("src"),
        F.col("p")[2].alias("dst"),
        F.col("p")[1].alias("type"),
        F.create_map().cast("map<string,string>").alias("properties"),
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select("dst"))
        .distinct()
        .select(
            "id",
            F.lit("Resource").alias("label"),
            F.create_map().cast("map<string,string>").alias("properties"),
        )
    )
    return PropertyGraph(nodes=nodes, edges=edges, is_directed=is_directed, name=name)


def read_property_graph_jsonl(
    spark: SparkSession,
    path: str,
    name: str = "graph",
    is_directed: bool = False,
    inject_partition_id: int | None = None,
) -> PropertyGraph:
    """JSON-lines property graph in the reference's Kafka edge wire format
    (one edge per line with inline source/destination nodes). Node labels
    ride in properties['label'] when present; edge type in
    properties['type'] (graph_with_properties.txt convention).

    ``inject_partition_id=k`` adds the reference's ``partitionID``
    meta-property to every node (MetaPropertyLink.h; assignment =
    ``stoi(id) % k``, Partitioner.cpp:110-112 hashPartitioning) so Cypher
    results expose the same partition column the reference streams back.
    """
    raw = spark.read.schema(EDGE_WIRE_SCHEMA).json(path)
    edges = raw.select(
        F.concat_ws("->", F.col("source.id"), F.col("destination.id")).alias("id"),
        F.col("source.id").alias("src"),
        F.col("destination.id").alias("dst"),
        F.col("properties")["type"].alias("type"),
        F.col("properties").alias("properties"),
    )
    nodes = (
        raw.select(F.col("source.id").alias("id"), F.col("source.properties").alias("props"))
        .union(raw.select("destination.id", "destination.properties"))
        .groupBy("id")
        .agg(F.first("props", ignorenulls=True).alias("props"))
        .select(
            "id",
            F.col("props")["label"].alias("label"),
            F.col("props").alias("properties"),
        )
    )
    if inject_partition_id is not None:
        pid = (F.col("id").cast("long") % inject_partition_id).cast("string")
        nodes = nodes.select(
            "id",
            "label",
            F.map_concat(
                "properties", F.create_map(F.lit("partitionID"), pid)
            ).alias("properties"),
        )
    return PropertyGraph(nodes=nodes, edges=edges, is_directed=is_directed, name=name)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
) -> DataFrame:
    """JSON-lines document corpus — the standard LLM pretraining
    interchange format (one object per line: {"text": ..., metadata}).

    Reads with an EXPLICIT schema (no schema-inference pre-pass: at
    100 TB that pass would read the corpus twice); unknown metadata keys
    are simply not projected. Rows with a missing/empty text field are
    dropped. When ``id_field`` is absent, doc_id derives from the content
    hash (first 12 md5 hex chars as a BIGINT) so reruns, engines and
    partitionings assign the same id to the same document — the same
    content-addressing rule the dedup/split operators key on.

    Returns the `documents` shape downstream operators expect:
    (doc_id bigint, text, lang, source, n_chars).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(text_field, T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
        + ([T.StructField(id_field, T.LongType())] if id_field else [])
    )
    raw = spark.read.schema(schema).json(path)
    txt = F.col(text_field)
    raw = raw.filter(txt.isNotNull() & (F.length(txt) > 0))
    doc_id = (
        F.col(id_field)
        if id_field
        else F.conv(F.substring(F.md5(txt), 1, 12), 16, 10).cast("long")
    )
    return raw.select(
        doc_id.alias("doc_id"),
        txt.alias("text"),
        F.col("lang"),
        F.col("source"),
        F.length(txt).cast("long").alias("n_chars"),
    )


def read_graphml(
    spark: SparkSession, path: str, name: str = "graph"
) -> PropertyGraph:
    """GraphML import — the inverse of sinks.export_graphml, completing
    the roundtrip with the Gephi/NetworkX/igraph interchange format the
    export targets (reference ingest family, SURVEY §2.4).

    Distributed parse: the XML is read as a text source (header,
    node/edge part-files, footer all under ``path``; a single flat
    .graphml file works identically) and each element is decomposed with
    regexp_extract + entity unescape + from_json — Catalyst expressions
    end to end, no driver-side XML tree at any size. Constraint: one
    element per line (what export_graphml, NetworkX's writer, and
    Gephi's default layout emit); true multi-line XML needs a dedicated
    datasource and is out of scope.

    Directionality is auto-detected from the <graph edgedefault=...>
    header element."""

    def unesc(c):
        out = c
        # reverse of export's escape chain; &amp; LAST so it can't
        # re-introduce entities
        for raw, rep in (("&quot;", '"'), ("&gt;", ">"), ("&lt;", "<"), ("&amp;", "&")):
            out = F.replace(out, F.lit(raw), F.lit(rep))
        return out

    def data_key(key: str):
        return F.nullif(
            unesc(F.regexp_extract("value", f'<data key="{key}">(.*?)</data>', 1)),
            F.lit(""),
        )

    raw = spark.read.option("recursiveFileLookup", "true").text(path)
    header = (
        raw.filter(F.col("value").contains("<graph "))
        .select(F.regexp_extract("value", 'edgedefault="([^"]*)"', 1).alias("d"))
        .first()
    )
    is_directed = bool(header) and header["d"] == "directed"
    nodes = raw.filter(F.col("value").contains("<node ")).select(
        unesc(F.regexp_extract("value", '<node id="([^"]*)"', 1)).alias("id"),
        data_key("label").alias("label"),
        F.from_json(data_key("props"), "map<string,string>").alias("properties"),
    )
    edges = raw.filter(F.col("value").contains("<edge ")).select(
        unesc(F.regexp_extract("value", '<edge source="([^"]*)"', 1)).alias("src"),
        unesc(F.regexp_extract("value", 'target="([^"]*)"', 1)).alias("dst"),
        data_key("type").alias("type"),
    )
    edges = edges.select(
        F.concat_ws("->", "src", "dst").alias("id"),
        "src",
        "dst",
        "type",
        F.lit(None).cast("map<string,string>").alias("properties"),
    )
    return PropertyGraph(nodes=nodes, edges=edges, is_directed=is_directed, name=name)
