"""Link prediction as distributed neighborhood scoring.

The reference trains a federated GraphSAGE link predictor per partition
(`train`/`predict`/`merge` frontend commands — FrontEnd.cpp:321,333,319;
src_python/models/supervised.py:41-212) and serves edge-probability
queries from the merged model. TensorFlow/StellarGraph is out of scope
here (SURVEY §2.7); the Spark-first equivalent surface is a deterministic
*topological* link predictor — score non-adjacent vertex pairs by
neighborhood overlap (common neighbors / Jaccard), the standard classical
baseline the GraphSAGE papers themselves compare against.

Scale notes:
 * Candidate generation enumerates wedges (x —v— y): one self-join of the
   adjacency list on the shared center, cost Σ_v deg(v)². This is the same
   frontier GraphSAGE samples; at 100 TB the hub vertices dominate, so the
   center join is AQE-skew-split and an optional ``max_center_degree`` cap
   (= GraphSAGE's neighbor-sampling budget) bounds the quadratic term.
 * Everything else is partial-aggregated groupBys and key joins — no
   driver-side state; the "model" is a DataFrame of scored pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jasminegraph_spark.analytics.graph_algs import canonical_undirected
from jasminegraph_spark.cache import finalize


def link_prediction(
    edges: DataFrame,
    top_k: int = 50,
    min_common: int = 2,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Top-``top_k`` predicted links (a < b, not currently adjacent) ranked
    by Jaccard overlap of neighborhoods; ties broken on (a, b).

    Returns (a, b, common_neighbors, jaccard). Jaccard = cn / (deg_a +
    deg_b − cn) is an integer quotient — bit-identical across engines, so
    the DuckDB oracle compares it unrounded.
    """
    und = canonical_undirected(edges).persist()
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("deg")).persist()

    centers = adj
    if max_center_degree is not None:
        ok = deg.filter(F.col("deg") <= max_center_degree).select("v")
        centers = adj.join(ok, "v", "left_semi")

    # wedge join on the shared center vertex; x < y emits each pair once
    left = centers.select("v", F.col("w").alias("x"))
    right = centers.select("v", F.col("w").alias("y"))
    pairs = (
        left.join(right, "v")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    # drop pairs that are already edges
    cand = pairs.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("v").alias("x"), F.col("deg").alias("dx")), "x")
        .join(deg.select(F.col("v").alias("y"), F.col("deg").alias("dy")), "y")
        .select(
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("dx") + F.col("dy") - F.col("common_neighbors"))
            ).alias("jaccard"),
        )
    )
    top = scored.orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b")).limit(top_k)
    return finalize(top, und, deg)


def node_embeddings(edges: DataFrame) -> DataFrame:
    """Deterministic structural node embedding: the 4-feature vector
    [degree, Σ neighbor-degree, max neighbor-degree, min neighbor-degree]
    per vertex (un-normalized integers — exact across engines).

    This is the hand-rolled stand-in for the reference's learned GraphSAGE
    node representations (src_python/models/supervised.py:41-212):
    degree profile ≈ the 1-hop aggregation a GraphSAGE layer computes,
    without trained weights — deterministic, so oracle-checkable. Returns
    (v, f1, f2, f3, f4)."""
    und = canonical_undirected(edges)
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("deg"))
    nbr = (
        adj.join(deg.select(F.col("v").alias("w"), F.col("deg").alias("wd")), "w")
        .groupBy("v")
        .agg(
            F.sum("wd").alias("sum_nd"),
            F.max("wd").alias("max_nd"),
            F.min("wd").alias("min_nd"),
        )
    )
    return deg.join(nbr, "v").select(
        "v",
        F.col("deg").cast("double").alias("f1"),
        F.col("sum_nd").cast("double").alias("f2"),
        F.col("max_nd").cast("double").alias("f3"),
        F.col("min_nd").cast("double").alias("f4"),
    )


def link_prediction_embedding(
    edges: DataFrame,
    top_k: int = 50,
    min_common: int = 2,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Embedding-similarity link predictor: candidate pairs (wedge-joined,
    ≥ ``min_common`` common neighbors, non-adjacent) scored by the COSINE
    of their structural node embeddings — the `predict` surface of the
    reference's trained model (FrontEnd.cpp:333; supervised.py dot-product
    scoring), with node_embeddings() standing in for the learned encoder.

    Same candidate plan as link_prediction (equi-joins only); the scoring
    join touches |candidates| rows. Returns (a, b, common_neighbors,
    cosine) — cosine rounded to 6 for portable rank boundaries."""
    und = canonical_undirected(edges).persist()
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    centers = adj
    if max_center_degree is not None:
        # GraphSAGE's neighbor-sampling budget: cap the quadratic wedge
        # fan-out at hub vertices
        deg_v = adj.groupBy("v").agg(F.count("*").alias("d"))
        ok = deg_v.filter(F.col("d") <= max_center_degree).select("v")
        centers = adj.join(ok, "v", "left_semi")
    left = centers.select("v", F.col("w").alias("x"))
    right = centers.select("v", F.col("w").alias("y"))
    pairs = (
        left.join(right, "v")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    cand = pairs.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"], "left_anti"
    )
    emb = node_embeddings(edges).persist()
    ea = emb.select(
        F.col("v").alias("x"),
        *[F.col(f"f{i}").alias(f"a{i}") for i in (1, 2, 3, 4)],
    )
    eb = emb.select(
        F.col("v").alias("y"),
        *[F.col(f"f{i}").alias(f"b{i}") for i in (1, 2, 3, 4)],
    )
    dot = sum(F.col(f"a{i}") * F.col(f"b{i}") for i in (1, 2, 3, 4))
    na = F.sqrt(sum(F.col(f"a{i}") * F.col(f"a{i}") for i in (1, 2, 3, 4)))
    nb = F.sqrt(sum(F.col(f"b{i}") * F.col(f"b{i}") for i in (1, 2, 3, 4)))
    scored = (
        cand.join(ea, "x")
        .join(eb, "y")
        .select(
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            "common_neighbors",
            F.round(dot / (na * nb), 6).alias("cosine"),
        )
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("a"), F.asc("b")).limit(top_k)
    return finalize(top, und, emb)
