"""Deterministic synthetic graph generators for scale testing.

The reference ships fixed test graphs (powergrid, cora); testing AT SCALE
needs graphs of arbitrary size with realistic structure. R-MAT (the
Graph500 generator) produces power-law degree distributions from a
recursive quadrant recursion — here driven by content hashes instead of
an RNG, so a (scale, n_edges) pair names ONE graph: any executor count,
run, or engine regenerates it bit-identically (and small instances are
DuckDB-oracle-checkable like every other operator).

Generation is `spark.range(n_edges)` + pure expressions — perfectly
parallel, no state, no driver data; a 2^30-vertex graph generates at
scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Graph500 defaults
_A, _B, _C = 0.57, 0.19, 0.19  # d = 0.05


def _level_u(edge_col, level: int):
    """Uniform (0,1) for (edge, level) from an md5 prefix — the hash
    plays the RNG, identically in any engine."""
    h = F.md5(F.concat_ws(":", edge_col.cast("string"), F.lit(str(level))))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(float(16**12))


def rmat_edges(
    spark: SparkSession,
    scale: int = 10,
    n_edges: int | None = None,
    edge_factor: int = 16,
) -> DataFrame:
    """R-MAT edge list over 2^scale vertices (src, dst), power-law by
    construction. Per edge and recursion level, one hash-uniform picks
    the quadrant (A, B, C, D) = (0.57, 0.19, 0.19, 0.05); the chosen
    bits assemble src/dst ids. Self-loops and duplicates are kept (as in
    Graph500) — canonical_undirected() downstream dedups when needed."""
    if n_edges is None:
        n_edges = edge_factor * (1 << scale)
    e = spark.range(n_edges).select(F.col("id").alias("edge_id"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        u = _level_u(F.col("edge_id"), level)
        src_bit = (u >= F.lit(_A + _B)).cast("long")
        dst_bit = (
            ((u >= F.lit(_A)) & (u < F.lit(_A + _B)))
            | (u >= F.lit(_A + _B + _C))
        ).cast("long")
        src = src + F.shiftleft(src_bit, level)
        dst = dst + F.shiftleft(dst_bit, level)
    return e.select("edge_id", src.alias("src"), dst.alias("dst"))


def uniform_edges(
    spark: SparkSession, n_vertices: int, n_edges: int
) -> DataFrame:
    """Erdős–Rényi-style uniform edge list (hash-deterministic)."""
    e = spark.range(n_edges).select(F.col("id").alias("edge_id"))
    u1 = _level_u(F.col("edge_id"), 0)
    u2 = _level_u(F.col("edge_id"), 1)
    return e.select(
        "edge_id",
        F.floor(u1 * n_vertices).cast("long").alias("src"),
        F.floor(u2 * n_vertices).cast("long").alias("dst"),
    )


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    words_per_doc: int = 40,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-driven document corpus for text/dedup stress at
    any scale (the parquet testdata tops out at sf0.1): doc i's words are
    md5-derived from its SEED id, and every doc with i % 10 == 9 reuses
    the seed of its decade base (i-9) plus one appended marker word —
    planting exactly one KNOWN near-duplicate pair per complete decade
    (~10% of the corpus), so LSH/dedup recall has exact ground truth at
    10^6+ docs. Pure Catalyst (range + sequence/transform + md5): no RNG
    state, no Python, embarrassingly parallel like a real ingest."""
    base = spark.range(n_docs).withColumnRenamed("id", id_col)
    seed = (
        F.when(F.col(id_col) % 10 == 9, F.col(id_col) - 9)
        .otherwise(F.col(id_col))
        .cast("string")
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda i: F.substring(F.md5(F.concat_ws("-", seed, i.cast("string"))), 1, 6),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        F.col(id_col) % 10 == 9,
        F.concat(text, F.lit(" zz"), F.col(id_col).cast("string")),
    ).otherwise(text)
    return base.select(F.col(id_col), text.alias("text"))
