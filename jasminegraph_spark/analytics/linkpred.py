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
