"""Cypher write clauses (SET / DELETE / DETACH DELETE / MERGE) against a
parquet-backed graph.

The reference's grammar recognizes these but its planner never implements
them (QueryPlanner.cpp TODO branches — SURVEY §2.1 'unimplemented Cypher
surface'); only CREATE is live. On the DataFrame substrate they are
read-transform-replace snapshots of the nodes/edges tables:

 * SET    — map_concat property update on the matched id set
 * DELETE — anti-join removal (plain DELETE refuses when incident edges
            remain, matching Cypher semantics; DETACH removes them)
 * MERGE  — match-or-create on (labels, literal properties)

Snapshot replace is write-to-temp + swap. On a real deployment this is a
table-format transaction (Delta/Iceberg MERGE/DELETE); plain parquet
directories keep the engine dependency-free here — the transform plans
are identical either way.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jasminegraph_spark.cypher import ast
from jasminegraph_spark.cypher.compiler import CypherCompileError, _Compiler, cypher_create
from jasminegraph_spark.cypher.parser import parse
from jasminegraph_spark.graph import PropertyGraph


def _replace(df: DataFrame, path: str) -> None:
    """Materialize ``df`` as the new content of ``path`` (temp + swap —
    Spark cannot overwrite an input path it is lazily reading)."""
    tmp = path.rstrip("/") + "__tmp"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)


def _load(spark: SparkSession, graph_path: str, is_directed: bool) -> PropertyGraph:
    from jasminegraph_spark.graph import EDGE_SCHEMA

    if os.path.isdir(f"{graph_path}/edges"):
        edges = spark.read.parquet(f"{graph_path}/edges")
    else:  # a CREATE of nodes only never writes the edges dir
        edges = spark.createDataFrame([], EDGE_SCHEMA)
    return PropertyGraph(
        nodes=spark.read.parquet(f"{graph_path}/nodes"),
        edges=edges,
        is_directed=is_directed,
    )


def cypher_write(
    spark: SparkSession, graph_path: str, text: str, is_directed: bool = True
) -> dict:
    """Execute a write query against the graph stored at ``graph_path``.
    Returns mutation stats (nodes_set / nodes_deleted / edges_deleted /
    nodes_created / edges_created)."""
    q = parse(text)
    if q.is_create:
        nodes, edges = cypher_create(spark, text)
        nodes.write.mode("append").parquet(f"{graph_path}/nodes")
        if edges.take(1):
            edges.write.mode("append").parquet(f"{graph_path}/edges")
        return {"nodes_created": nodes.count(), "edges_created": edges.count()}
    if q.write_clause is None:
        raise CypherCompileError("not a write query (no SET/DELETE/MERGE/CREATE)")
    g = _load(spark, graph_path, is_directed)

    if isinstance(q.write_clause, ast.MergeClause):
        return _merge(spark, graph_path, g, q.write_clause)

    # compile the reading part to bind variables
    comp = _Compiler(g)
    df = None
    for clause in q.clauses:
        if isinstance(clause, ast.MatchClause) and not clause.optional:
            for pattern in clause.patterns:
                df = comp.compile_pattern(pattern, df)
            if clause.where is not None:
                df = df.filter(comp.predicate(clause.where))
        else:
            raise CypherCompileError("write queries support plain MATCH clauses only")
    if df is None:
        raise CypherCompileError("write clause requires a MATCH part")
    # materialize the match BEFORE any mutation: _replace rewrites the
    # parquet files the lazy match plan still references, so a second
    # SET/REMOVE item (or the node phase of a DELETE after its edge
    # phase) would otherwise re-scan deleted files
    from jasminegraph_spark.cache import checkpoint

    df = checkpoint(df)

    wc = q.write_clause
    if isinstance(wc, ast.CreateRelClause):
        return _create_rel(spark, graph_path, g, df, comp, wc)
    if isinstance(wc, ast.SetClause):
        stats = {"nodes_set": 0}
        for item in wc.items:
            if item.var not in comp.node_vars:
                raise CypherCompileError(f"SET target {item.var} is not a node variable")
            ids = df.select(F.col(f"{item.var}.id").alias("__id")).distinct()
            stats["nodes_set"] = ids.count()
            if isinstance(item, ast.SetLabelItem):
                # single-label model: SET n:Label RELABELS the matched
                # nodes (openCypher would add to a label set — divergence
                # documented on the AST node)
                updated = g.nodes.join(ids, g.nodes.id == F.col("__id"), "left").select(
                    "id",
                    F.when(F.col("__id").isNotNull(), F.lit(item.label))
                    .otherwise(F.col("label"))
                    .alias("label"),
                    "properties",
                )
            else:
                updated = g.nodes.join(ids, g.nodes.id == F.col("__id"), "left").select(
                    "id",
                    "label",
                    F.when(
                        F.col("__id").isNotNull(),
                        F.map_concat(
                            F.map_filter(
                                "properties", lambda k, v: k != F.lit(item.key)
                            ),
                            F.create_map(F.lit(item.key), F.lit(str(item.value))),
                        ),
                    )
                    .otherwise(F.col("properties"))
                    .alias("properties"),
                )
            _replace(updated, f"{graph_path}/nodes")
            g = _load(spark, graph_path, is_directed)
        return stats

    if isinstance(wc, ast.RemoveClause):
        stats = {"nodes_updated": 0}
        for item in wc.items:
            if item.var not in comp.node_vars:
                raise CypherCompileError(
                    f"REMOVE target {item.var} is not a node variable"
                )
            ids = df.select(F.col(f"{item.var}.id").alias("__id")).distinct()
            stats["nodes_updated"] = ids.count()
            joined = g.nodes.join(ids, g.nodes.id == F.col("__id"), "left")
            if item.key is not None:
                updated = joined.select(
                    "id",
                    "label",
                    F.when(
                        F.col("__id").isNotNull(),
                        F.map_filter("properties", lambda k, v: k != F.lit(item.key)),
                    )
                    .otherwise(F.col("properties"))
                    .alias("properties"),
                )
            else:
                # REMOVE n:Label — clears the label where it matches
                # (single-label model twin of openCypher's set removal)
                updated = joined.select(
                    "id",
                    F.when(
                        F.col("__id").isNotNull() & (F.col("label") == item.label),
                        F.lit(None).cast("string"),
                    )
                    .otherwise(F.col("label"))
                    .alias("label"),
                    "properties",
                )
            _replace(updated, f"{graph_path}/nodes")
            g = _load(spark, graph_path, is_directed)
        return stats

    if isinstance(wc, ast.DeleteClause):
        stats = {"nodes_deleted": 0, "edges_deleted": 0}
        node_ids = None
        for var in wc.vars:
            if var in comp.rel_vars:
                rel_ids = df.select(F.col(f"{var}.id").alias("__id")).distinct()
                # count the matched side once (semi join) instead of two
                # full-table counts (total − kept)
                stats["edges_deleted"] += g.edges.join(
                    rel_ids, g.edges.id == F.col("__id"), "left_semi"
                ).count()
                kept = g.edges.join(rel_ids, g.edges.id == F.col("__id"), "left_anti")
                _replace(kept, f"{graph_path}/edges")
                g = _load(spark, graph_path, is_directed)
            elif var in comp.node_vars:
                ids = df.select(F.col(f"{var}.id").alias("__id")).distinct()
                node_ids = ids if node_ids is None else node_ids.union(ids).distinct()
            else:
                raise CypherCompileError(f"DELETE target {var} is unbound")
        if node_ids is not None:
            incident = g.edges.join(
                node_ids,
                (g.edges.src == F.col("__id")) | (g.edges.dst == F.col("__id")),
                "left_semi",
            )
            n_incident = incident.count()
            if n_incident and not wc.detach:
                raise CypherCompileError(
                    f"cannot DELETE nodes with {n_incident} incident relationships; "
                    "use DETACH DELETE"
                )
            if wc.detach and n_incident:
                kept_edges = g.edges.join(
                    node_ids,
                    (g.edges.src == F.col("__id")) | (g.edges.dst == F.col("__id")),
                    "left_anti",
                )
                stats["edges_deleted"] += n_incident
                _replace(kept_edges, f"{graph_path}/edges")
            stats["nodes_deleted"] = g.nodes.join(
                node_ids, g.nodes.id == F.col("__id"), "left_semi"
            ).count()
            kept_nodes = g.nodes.join(node_ids, g.nodes.id == F.col("__id"), "left_anti")
            _replace(kept_nodes, f"{graph_path}/nodes")
        return stats

    raise CypherCompileError(f"unsupported write clause {wc!r}")


def _create_rel(spark, graph_path: str, g, df, comp, wc) -> dict:
    """MATCH ... CREATE (a)-[:T {..}]->(b): one new relationship per
    DISTINCT matched (a, b) endpoint pair (the distinct is a determinism
    guard — re-running the same statement is idempotent because edge ids
    are content-derived and pre-existing ids are skipped, unlike
    openCypher's per-row unconditional CREATE; documented divergence)."""
    p = wc.pattern
    if len(p.nodes) != 2 or len(p.rels) != 1:
        raise CypherCompileError(
            "MATCH ... CREATE supports a single (a)-[:T]->(b) relationship pattern"
        )
    a, b = p.nodes[0].var, p.nodes[1].var
    rel = p.rels[0]
    for v in (a, b):
        if v not in comp.node_vars:
            raise CypherCompileError(f"CREATE endpoint {v} is not a bound node variable")
    if rel.direction == "in":
        a, b = b, a
    rtype = rel.types[0] if rel.types else None
    props = {k: str(v) for k, v in rel.props.items()}
    prop_col = (
        F.create_map(*[x for kv in props.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])
        if props
        else F.create_map().cast("map<string,string>")
    )
    pairs = df.select(
        F.col(f"{a}.id").alias("src"), F.col(f"{b}.id").alias("dst")
    ).distinct()
    new_edges = pairs.select(
        F.concat(
            F.col("src"), F.lit("->"), F.col("dst"), F.lit(f":{rtype if rtype else 0}")
        ).alias("id"),
        "src",
        "dst",
        F.lit(rtype).alias("type"),
        prop_col.alias("properties"),
    )
    fresh = new_edges.join(g.edges.select("id"), "id", "left_anti")
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(f"{graph_path}/edges")
    return {"edges_created": n}


def _node_cond(node: ast.NodePattern):
    cond = F.lit(True)
    if node.labels:
        cond = cond & (F.col("label") == node.labels[0])
    for k, v in node.props.items():
        cond = cond & (F.col("properties")[k] == str(v))
    return cond


def _create_merge_node(
    spark, graph_path: str, node: ast.NodePattern, extra_props: dict | None = None
) -> str:
    """Create a node for a MERGE miss by constructing the row DIRECTLY
    with the same content-hash id scheme cypher_create uses
    (compiler.py:874-882) — no generated-CREATE-text round-trip, so
    property values containing quotes/braces cannot inject into or break
    the statement. The id derives from the MATCH pattern's label+props
    only — ``extra_props`` (ON CREATE SET items) are applied after, so
    the same MERGE pattern resolves to the same node regardless of its
    ON CREATE payload. Returns the new node id."""
    import hashlib

    from jasminegraph_spark.graph import NODE_SCHEMA

    props = {k: str(v) for k, v in node.props.items()}
    nid = props.get("id")
    if nid is None:
        basis = f"{sorted(node.labels)}|{sorted(props.items())}"
        nid = hashlib.md5(basis.encode()).hexdigest()[:16]
    props.update({k: str(v) for k, v in (extra_props or {}).items()})
    spark.createDataFrame(
        [(nid, node.labels[0] if node.labels else None, props)], NODE_SCHEMA
    ).write.mode("append").parquet(f"{graph_path}/nodes")
    return nid


def _merge_endpoint(spark, graph_path: str, g: PropertyGraph, node: ast.NodePattern):
    """Resolve a MERGE endpoint: the MIN matching node id (deterministic
    when the label+props match several), creating the node when nothing
    matches. Returns (node_id, n_created, refreshed_graph)."""
    row = g.nodes.filter(_node_cond(node)).agg(F.min("id").alias("id")).first()
    if row and row["id"] is not None:
        return row["id"], 0, g
    nid = _create_merge_node(spark, graph_path, node)
    return nid, 1, _load(spark, graph_path, g.is_directed)


def _merge(spark, graph_path: str, g: PropertyGraph, mc: ast.MergeClause) -> dict:
    pattern = mc.pattern
    if (mc.on_create or mc.on_match) and len(pattern.nodes) != 1:
        raise CypherCompileError(
            "ON CREATE/ON MATCH SET is supported on single-node MERGE"
        )
    if len(pattern.nodes) == 2 and len(pattern.rels) == 1:
        # relationship upsert: MERGE (a ..)-[:T]->(b ..) — resolve/create
        # both endpoints, then create the typed edge iff absent
        rel = pattern.rels[0]
        na, nb = pattern.nodes
        if rel.direction == "in":
            na, nb = nb, na
        rtype = rel.types[0] if rel.types else None
        sa, ca, g = _merge_endpoint(spark, graph_path, g, na)
        sb, cb, g = _merge_endpoint(spark, graph_path, g, nb)
        cond = (F.col("src") == sa) & (F.col("dst") == sb)
        if rtype:
            cond = cond & (F.col("type") == rtype)
        if g.edges.filter(cond).take(1):
            return {"nodes_created": ca + cb, "edges_created": 0, "matched": True}
        props = {k: str(v) for k, v in rel.props.items()}
        rid = f"{sa}->{sb}:{rtype if rtype else 0}"
        from jasminegraph_spark.graph import EDGE_SCHEMA

        spark.createDataFrame([(rid, sa, sb, rtype, props)], EDGE_SCHEMA).write.mode(
            "append"
        ).parquet(f"{graph_path}/edges")
        return {"nodes_created": ca + cb, "edges_created": 1, "matched": False}
    if len(pattern.nodes) != 1:
        raise CypherCompileError(
            "MERGE supports single-node and (a)-[:T]->(b) relationship patterns"
        )
    node = pattern.nodes[0]
    cond = F.lit(True)
    if node.labels:
        cond = cond & (F.col("label") == node.labels[0])
    for k, v in node.props.items():
        cond = cond & (F.col("properties")[k] == str(v))
    if g.nodes.filter(cond).take(1):
        stats = {"nodes_created": 0, "matched": True}
        if mc.on_match:
            # ON MATCH SET applies to EVERY matched node (openCypher)
            updates = {i.key: str(i.value) for i in mc.on_match}
            upd_map = F.create_map(
                *[x for k, v in updates.items() for x in (F.lit(k), F.lit(v))]
            )
            keys = list(updates)
            updated = g.nodes.select(
                "id",
                "label",
                F.when(
                    cond,
                    F.map_concat(
                        # NODE_SCHEMA allows NULL properties; map_filter(NULL)
                        # would propagate NULL and silently drop the update
                        F.map_filter(
                            F.coalesce(
                                F.col("properties"),
                                F.create_map().cast("map<string,string>"),
                            ),
                            lambda k, v: ~k.isin(keys),
                        ),
                        upd_map,
                    ),
                )
                .otherwise(F.col("properties"))
                .alias("properties"),
            )
            stats["nodes_set"] = g.nodes.filter(cond).count()
            _replace(updated, f"{graph_path}/nodes")
        return stats
    _create_merge_node(
        spark, graph_path, node, {i.key: i.value for i in mc.on_create}
    )
    stats = {"nodes_created": 1, "matched": False}
    if mc.on_create or mc.on_match:
        stats["nodes_set"] = 1 if mc.on_create else 0
    return stats
