"""Semantic multi-hop beam search — the reference's GenAI query surface.

Reference: query/processor/nlp/semanticbeamsearch/SemanticBeamSearch.h:31-63
(.cpp 623 LoC) + SemanticBeamSearchExecutor.cpp: multi-hop beam search over
the property graph guided by FAISS embedding similarity, with remote
expansion to other partitions over TCP.

Spark-first: the beam is a small DataFrame iterated through (beam ⋈ edges)
joins; embedding scores come from a broadcast query vector evaluated as a
built-in expression fold (no FAISS, no Python in the loop). Remote
expansion disappears — shuffle co-locates the frontier with its adjacency.

At scale: the frontier is ≤ beam_width rows, so each hop is a broadcast
join of the frontier against the (large) edge table keyed on src — an
index-free adjacency probe, the same access pattern the reference gets
from its adjacency lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jasminegraph_spark.cache import checkpoint


def semantic_beam_search(
    edges: DataFrame,
    embeddings: DataFrame,
    query_vec: list,
    beam_width: int = 5,
    hops: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    undirected: bool = True,
) -> DataFrame:
    """Beam search from the top-`beam_width` seeds by cosine(query, node),
    expanding `hops` times; each hop keeps the `beam_width` best-scoring
    frontier nodes. Returns (node, score, hop, path array).

    Scoring is cosine similarity of each candidate's embedding against the
    broadcast literal query vector — pure Catalyst expressions.
    """
    e = edges.select("src", "dst")
    if undirected:
        e = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()

    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = embeddings.select(
        F.col(id_col).alias("node"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn("q", qlit)
    scored_nodes = emb.select(
        "node",
        F.round(
            F.expr("aggregate(zip_with(v, q, (x, y) -> x * y), cast(0 as double), (a, b) -> a + b)")
            / (
                F.sqrt(F.expr("aggregate(transform(v, x -> x*x), cast(0 as double), (a,b) -> a+b)"))
                * F.sqrt(F.expr("aggregate(transform(q, x -> x*x), cast(0 as double), (a,b) -> a+b)"))
            ),
            6,
        ).alias("score"),
    )

    beam = (
        scored_nodes.orderBy(F.desc("score"), F.asc("node"))
        .limit(beam_width)
        .select("node", "score", F.lit(0).alias("hop"), F.array("node").alias("path"))
    )
    visited = beam.select("node")

    for h in range(1, hops + 1):
        frontier = (
            F.broadcast(beam.filter(F.col("hop") == h - 1))
            .join(e, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("cand"), "path")
        )
        frontier = frontier.join(
            visited.withColumnRenamed("node", "cand"), "cand", "left_anti"
        )
        cands = (
            frontier.join(scored_nodes.withColumnRenamed("node", "cand"), "cand")
            .select(
                F.col("cand").alias("node"),
                "score",
                F.lit(h).alias("hop"),
                F.concat("path", F.array("cand")).alias("path"),
            )
            # one best path per candidate, then global beam cut
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("node").orderBy(F.desc("score"), F.asc("path"))
                ),
            )
            .filter(F.col("rn") == 1)
            .drop("rn")
            .orderBy(F.desc("score"), F.asc("node"))
            .limit(beam_width)
        )
        cands = cands.transform(checkpoint)
        if cands.isEmpty():
            break
        beam = beam.unionByName(cands)
        visited = visited.union(cands.select("node")).distinct().transform(checkpoint)
    return beam
