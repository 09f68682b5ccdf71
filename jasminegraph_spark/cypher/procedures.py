"""CALL ... YIELD procedure registry for the Cypher frontend.

The reference grammar recognizes CALL/YIELD tokens (util/Const.h) but the
planner never implements them (QueryPlanner.cpp TODO branches — SURVEY
§2.1 'unimplemented surface'). Here they expose the analytics commands
(`pgrnk`, `trian`, `idegree`, …, FrontEnd.cpp:230-346) *inside* a query,
so a caller can post-filter/join/aggregate procedure output with ordinary
clauses — each procedure returns a DataFrame and composes with Catalyst
like any other scan.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from jasminegraph_spark.analytics import (
    connected_components,
    core_numbers,
    degree_distribution,
    egonet,
    hits,
    k_core,
    k_truss,
    link_prediction,
    pagerank,
    personalized_pagerank,
    random_walks,
    shortest_paths,
    triangle_count_df,
    triangle_list,
)
from jasminegraph_spark.graph import PropertyGraph

# name → fn(graph, *args) -> DataFrame. Output columns are the YIELD surface.
PROCEDURES: dict[str, Callable[..., DataFrame]] = {
    # (node, rank)
    "algo.pagerank": lambda g, alpha=0.85, iterations=5: pagerank(
        g.edges, float(alpha), int(iterations), undirected=not g.is_directed
    ),
    # (n_triangles)
    "algo.triangleCount": lambda g: triangle_count_df(g.edges),
    # (a, b, c)
    "algo.triangles": lambda g: triangle_list(g.edges),
    # (degree, n_nodes)
    "algo.degreeDistribution": lambda g, direction="in": degree_distribution(
        g.edges, direction
    ),
    # (node, component)
    "algo.components": lambda g: connected_components(g.edges),
    # (a, b) — surviving core edges
    "algo.kcore": lambda g, k: k_core(g.edges, int(k)),
    # (node, distance)
    "algo.shortestPaths": lambda g, source, max_hops=10: shortest_paths(
        g.edges, source, int(max_hops), undirected=not g.is_directed
    ),
    # (a, b, common_neighbors, jaccard)
    "algo.linkPrediction": lambda g, top_k=50: link_prediction(g.edges, int(top_k)),
    # (a, b) — induced ego edges
    "algo.egonet": lambda g, vertex: egonet(g.edges, vertex),
    # (node, rank) — seed-restart random walk (round-4 continuation)
    "algo.personalizedPagerank": lambda g, *seeds: personalized_pagerank(
        g.edges, list(seeds), undirected=not g.is_directed
    ),
    # (a, b, support) — surviving truss edges
    "algo.ktruss": lambda g, k=4: k_truss(g.edges, int(k)),
    # (node, core)
    "algo.coreNumbers": lambda g, rounds=8: core_numbers(g.edges, int(rounds)),
    # (node, hub, authority)
    "algo.hits": lambda g, iterations=5: hits(g.edges, int(iterations)),
    # (source, step, node)
    "algo.randomWalks": lambda g, length, *seeds: random_walks(
        g.edges, list(seeds), int(length), undirected=not g.is_directed
    ),
}


def resolve(name: str) -> Callable[..., DataFrame]:
    try:
        return PROCEDURES[name]
    except KeyError:
        known = ", ".join(sorted(PROCEDURES))
        raise KeyError(f"unknown procedure {name!r} (known: {known})") from None


def register(name: str, fn: Callable[..., DataFrame]) -> None:
    """Extension point: user-defined procedures (the reference has none —
    its CALL surface was never implemented at all)."""
    PROCEDURES[name] = fn
