"""Command-line frontend mirroring the reference's telnet commands.

The reference is driven over a socket with commands like `adgr`, `cypher`,
`trian`, `pgrnk`, `vcnt` (src/frontend/JasmineGraphFrontEnd.cpp:230-346).
This CLI exposes the same verbs against a local storage directory:

    python -m jasminegraph_spark --store /tmp/graphs adgr mygraph edges.dl
    python -m jasminegraph_spark --store /tmp/graphs cypher mygraph \\
        "MATCH (n) RETURN id(n) AS id LIMIT 5"
    python -m jasminegraph_spark --store /tmp/graphs trian mygraph
    python -m jasminegraph_spark --store /tmp/graphs pgrnk mygraph --top 5
    python -m jasminegraph_spark --store /tmp/graphs vcnt mygraph

Output is JSON lines (the reference streams JSON rows to the client).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jasminegraph_spark")
    ap.add_argument("--store", required=True, help="graph storage directory")
    ap.add_argument("--cpus", default="4")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("adgr");        p.add_argument("name"); p.add_argument("path"); p.add_argument("--directed", action="store_true")
    p = sub.add_parser("adrdf");       p.add_argument("name"); p.add_argument("path")
    p = sub.add_parser("adjson");      p.add_argument("name"); p.add_argument("path"); p.add_argument("--directed", action="store_true")
    p = sub.add_parser("cypher");      p.add_argument("name"); p.add_argument("query")
    p = sub.add_parser("cypher-write"); p.add_argument("name"); p.add_argument("query")
    p = sub.add_parser("trian");       p.add_argument("name")
    p = sub.add_parser("pgrnk");       p.add_argument("name"); p.add_argument("--alpha", type=float, default=0.85); p.add_argument("--iters", type=int, default=10); p.add_argument("--top", type=int, default=10)
    p = sub.add_parser("idegree");     p.add_argument("name")
    p = sub.add_parser("odegree");     p.add_argument("name")
    p = sub.add_parser("egonet");      p.add_argument("name"); p.add_argument("vertex")
    p = sub.add_parser("vcnt");        p.add_argument("name")
    p = sub.add_parser("ecnt");        p.add_argument("name")
    sub.add_parser("lst")
    p = sub.add_parser("rmgr");        p.add_argument("name")
    p = sub.add_parser("sdhdfs");      p.add_argument("name"); p.add_argument("path"); p.add_argument("--fmt", default="wire", choices=["wire", "edges", "graphml"])
    p = sub.add_parser("adgraphml");   p.add_argument("name"); p.add_argument("path")
    p = sub.add_parser("predict");     p.add_argument("name"); p.add_argument("--top", type=int, default=20)
    p = sub.add_parser("constructkg"); p.add_argument("name"); p.add_argument("path", help="parquet/jsonl of (doc_id, text)")
    p = sub.add_parser("beam", help="semantic-beam-search: multi-hop beam guided by text-embedding similarity"); p.add_argument("name"); p.add_argument("query"); p.add_argument("--width", type=int, default=5); p.add_argument("--hops", type=int, default=3); p.add_argument("--text-prop", default="name"); p.add_argument("--dim", type=int, default=32)
    sub.add_parser("truncate", help="remove ALL graphs (catalog + persisted store)")
    p = sub.add_parser("adstrmk");     p.add_argument("name"); p.add_argument("source_dir", help="directory of edge-JSON line files (Kafka stand-in)"); p.add_argument("--strian", action="store_true", help="also maintain the incremental triangle count")
    p = sub.add_parser("wcc");         p.add_argument("name")
    p = sub.add_parser("scc");         p.add_argument("name")
    p = sub.add_parser("msf");         p.add_argument("name"); p.add_argument("--weight-col", default="weight")
    p = sub.add_parser("kcore");       p.add_argument("name"); p.add_argument("--k", type=int, default=3)
    p = sub.add_parser("partition");   p.add_argument("name"); p.add_argument("--k", type=int, default=4); p.add_argument("--algo", default="hash", choices=["hash", "ldg", "fennel", "community", "range", "metis"]); p.add_argument("--quality", action="store_true", help="emit edge-cut/balance metrics instead of the assignment")
    p = sub.add_parser("bc");          p.add_argument("name"); p.add_argument("--sources", default="1,2,3"); p.add_argument("--hops", type=int, default=3)
    p = sub.add_parser("graphstats");  p.add_argument("name")
    p = sub.add_parser("ppr");         p.add_argument("name"); p.add_argument("--sources", default="1"); p.add_argument("--alpha", type=float, default=0.85); p.add_argument("--iters", type=int, default=10); p.add_argument("--top", type=int, default=10)
    p = sub.add_parser("ktruss");      p.add_argument("name"); p.add_argument("--k", type=int, default=4)
    p = sub.add_parser("wsp");         p.add_argument("name"); p.add_argument("source"); p.add_argument("--iters", type=int, default=10)
    p = sub.add_parser("train");       p.add_argument("name"); p.add_argument("--encoder", default="flat", choices=["flat", "sage"])
    p = sub.add_parser("merge");       p.add_argument("name"); p.add_argument("--workers", type=int, default=4); p.add_argument("--encoder", default="flat", choices=["flat", "sage"])
    p = sub.add_parser("walks");       p.add_argument("name"); p.add_argument("--sources", default="1"); p.add_argument("--length", type=int, default=5); p.add_argument("--node2vec", action="store_true"); p.add_argument("--p", type=float, default=2.0); p.add_argument("--q", type=float, default=0.5)
    args = ap.parse_args(argv)

    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", args.cpus)
    from jasminegraph_spark.engine import JasmineEngine
    from jasminegraph_spark.session import get_spark

    spark = get_spark("jasminegraph-cli")
    eng = JasmineEngine(spark, storage_path=args.store)

    # re-attach graphs already persisted in the store
    if os.path.isdir(args.store):
        for name in os.listdir(args.store):
            if name.startswith("_") or name == getattr(args, "name", None) and args.cmd in (
                "adgr", "adrdf", "adjson"
            ):
                continue
            if os.path.isdir(os.path.join(args.store, name, "nodes")):
                try:
                    # directedness restored from the graph's _meta.json
                    eng.catalog.load(name, args.store)
                except Exception:
                    pass

    def emit(obj):
        print(json.dumps(obj, default=str))

    if args.cmd == "adgr":
        g = eng.add_graph(args.name, args.path, is_directed=args.directed)
        emit({"added": args.name, "vertices": g.vertex_count(), "edges": g.edge_count()})
    elif args.cmd == "adrdf":
        g = eng.add_rdf_graph(args.name, args.path)
        emit({"added": args.name, "vertices": g.vertex_count(), "edges": g.edge_count()})
    elif args.cmd == "adjson":
        g = eng.add_json_graph(args.name, args.path, is_directed=args.directed)
        emit({"added": args.name, "vertices": g.vertex_count(), "edges": g.edge_count()})
    elif args.cmd == "cypher":
        for row in eng.cypher_rows(args.name, args.query):
            print(row)
    elif args.cmd == "cypher-write":
        emit(eng.cypher_write(args.name, args.query))
    elif args.cmd == "trian":
        emit({"triangles": eng.triangle_count(args.name)})
    elif args.cmd == "pgrnk":
        rows = eng.top_k_pagerank(
            args.name, k=args.top, alpha=args.alpha, iterations=args.iters
        ).collect()
        for r in rows:
            emit({"node": r["node"], "rank": r["rank"]})
    elif args.cmd in ("idegree", "odegree"):
        direction = "in" if args.cmd == "idegree" else "out"
        for r in eng.degree_distribution(args.name, direction).collect():
            emit({"degree": r["degree"], "n_nodes": r["n_nodes"]})
    elif args.cmd == "egonet":
        for r in eng.egonet(args.name, args.vertex).collect():
            emit({"a": r["a"], "b": r["b"]})
    elif args.cmd == "vcnt":
        emit({"vertices": eng.vertex_count(args.name)})
    elif args.cmd == "ecnt":
        emit({"edges": eng.edge_count(args.name)})
    elif args.cmd == "lst":
        for entry in eng.list_graphs():
            emit(entry)
    elif args.cmd == "rmgr":
        eng.remove_graph(args.name)
        emit({"removed": args.name})
    elif args.cmd == "sdhdfs":
        eng.export_graph(args.name, args.path, fmt=args.fmt)
        emit({"exported": args.name, "path": args.path, "fmt": args.fmt})
    elif args.cmd == "adgraphml":
        g = eng.add_graphml_graph(args.name, args.path)
        emit({"added": args.name, "vertices": g.vertex_count(), "edges": g.edge_count()})
    elif args.cmd == "predict":
        for r in eng.predict_links(args.name, top_k=args.top).collect():
            emit(
                {
                    "a": r["a"],
                    "b": r["b"],
                    "common_neighbors": r["common_neighbors"],
                    "jaccard": r["jaccard"],
                }
            )
    elif args.cmd == "train":
        # reference `train` (FrontEnd.cpp:321): fit the link classifier,
        # report held-out AUC vs the raw Jaccard heuristic
        from jasminegraph_spark.analytics.linkpred_ml import auc

        _, scored = eng.train_model(args.name, encoder=args.encoder)
        scored = scored.persist()
        emit(
            {
                "trained": args.name,
                "encoder": args.encoder,
                "test_auc": round(auc(scored), 4),
                "jaccard_auc": round(auc(scored, "jac"), 4),
                "n_test_examples": scored.count(),
            }
        )
        scored.unpersist()
    elif args.cmd == "merge":
        # reference `merge` (FrontEnd.cpp:319): disjoint-shard heads
        # FedAvg'd; report the merged model's held-out AUC
        from jasminegraph_spark.analytics.linkpred_ml import auc

        coeffs, intercept, scored = eng.merge_models(
            args.name, n_workers=args.workers, encoder=args.encoder
        )
        scored = scored.persist()
        emit(
            {
                "merged": args.name,
                "workers": args.workers,
                "encoder": args.encoder,
                "n_coefficients": len(coeffs),
                "intercept": round(intercept, 6),
                "test_auc": round(auc(scored), 4),
            }
        )
        scored.unpersist()
    elif args.cmd == "adstrmk":
        # drain-mode `adstrmk`: availableNow trigger consumes everything
        # currently in the directory then completes (the reference's
        # stream lives in a server process; the CLI is one-shot)
        ckpt = os.path.join(args.store, f"_ckpt_{args.name}")
        if args.strian:
            ingest, counter, query = eng.add_stream_with_triangles(
                args.name, args.source_dir, ckpt
            )
            query.awaitTermination()
            emit(
                {
                    "streamed": args.name,
                    "edges": ingest.total_edges(),
                    "triangles": counter.total,
                }
            )
        else:
            ingest, query = eng.add_stream(args.name, args.source_dir, ckpt)
            query.awaitTermination()
            emit({"streamed": args.name, "edges": ingest.total_edges()})
    elif args.cmd == "wcc":
        for r in eng.connected_components(args.name).collect():
            emit({"node": r["node"], "component": r["component"]})
    elif args.cmd == "scc":
        for r in eng.strongly_connected_components(args.name).collect():
            emit({"node": r["node"], "component": r["component"]})
    elif args.cmd == "msf":
        for r in eng.minimum_spanning_forest(args.name, args.weight_col).collect():
            emit({"a": r["a"], "b": r["b"], "weight": r["weight"]})
    elif args.cmd == "kcore":
        for r in eng.k_core(args.name, args.k).collect():
            emit({"a": r["a"], "b": r["b"]})
    elif args.cmd == "partition":
        if args.quality:
            emit(eng.partition_quality(args.name, args.k, args.algo))
        else:
            for r in eng.partition_graph(args.name, args.k, args.algo).collect():
                emit({"node": r["node"], "pid": r["pid"]})
    elif args.cmd == "bc":
        srcs = [s.strip() for s in args.sources.split(",") if s.strip()]
        for r in eng.betweenness(args.name, srcs, max_hops=args.hops).collect():
            emit({"node": r["node"], "betweenness": r["betweenness"]})
    elif args.cmd == "graphstats":
        cc = eng.clustering_coefficient(args.name).first()
        asrt = eng.assortativity(args.name).first()
        emit(
            {
                "n_triangles": cc["n_triangles"],
                "n_wedges": cc["n_wedges"],
                "global_cc": cc["global_cc"],
                "assortativity": asrt["assortativity"],
            }
        )
    elif args.cmd == "ppr":
        srcs = [s.strip() for s in args.sources.split(",") if s.strip()]
        rows = (
            eng.personalized_pagerank(
                args.name, srcs, alpha=args.alpha, iterations=args.iters
            )
            .orderBy("rank", ascending=False)
            .limit(args.top)
            .collect()
        )
        for r in rows:
            emit({"node": r["node"], "rank": r["rank"]})
    elif args.cmd == "ktruss":
        for r in eng.k_truss(args.name, args.k).collect():
            emit({"a": r["a"], "b": r["b"], "support": r["support"]})
    elif args.cmd == "wsp":
        for r in eng.weighted_shortest_paths(
            args.name, args.source, iterations=args.iters
        ).collect():
            emit({"node": r["node"], "distance": r["distance"]})
    elif args.cmd == "walks":
        srcs = [s.strip() for s in args.sources.split(",") if s.strip()]
        if args.node2vec:
            walks = eng.node2vec_walks(
                args.name, srcs, length=args.length, p=args.p, q=args.q
            )
        else:
            walks = eng.random_walks(args.name, srcs, length=args.length)
        for r in walks.collect():
            emit({"source": r["source"], "step": r["step"], "node": r["node"]})
    elif args.cmd == "constructkg":
        docs = (
            spark.read.parquet(args.path)
            if args.path.endswith(".parquet")
            else spark.read.json(args.path)
        )
        g = eng.construct_kg(args.name, docs)
        emit({"constructed": args.name, "vertices": g.vertex_count(), "edges": g.edge_count()})
    elif args.cmd == "beam":
        rows = eng.semantic_beam_search(
            args.name,
            args.query,
            beam_width=args.width,
            hops=args.hops,
            text_prop=args.text_prop,
            dim=args.dim,
        ).collect()
        for r in rows:
            emit(
                {
                    "node": r["node"],
                    "score": r["score"],
                    "hop": r["hop"],
                    "path": list(r["path"]),
                }
            )
    elif args.cmd == "truncate":
        emit({"truncated": eng.truncate()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
