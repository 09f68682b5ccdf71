"""Deterministic cache lifecycle for multi-pass operators.

Iterative/multi-reference operators persist their hot intermediates
(edge sets, adjacency, signatures) so one materialization feeds many
joins. In a long-lived engine session those persists must be RELEASED
when the operator finishes, or repeated analytics calls pin executor
storage until eviction thrash (the reference frees its per-query local
stores the same way when the executor completes).

`finalize(result, *cached)` is the contract: materialize the result once
(eager checkpoint — also truncates the lineage so the result no longer
references the caches), then unpersist every intermediate. The returned
frame serves any number of downstream actions from its checkpoint blocks
without recomputation.

Checkpoint mode (SCALE.md): `localCheckpoint` keeps blocks on executors —
fast, but an executor loss drops partitions mid-algorithm. At cluster
scale call :func:`set_checkpoint_dir` (or set the
``SPARK_GRAFT_CHECKPOINT_DIR`` env var before the first checkpoint) to
switch every iterative operator to reliable `.checkpoint()` into shared
storage (HDFS/S3); lineage truncation semantics are identical, so
results do not change — only the failure story does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# None → localCheckpoint; a path → reliable checkpoint into that dir
_CHECKPOINT_DIR: str | None = None


def set_checkpoint_dir(spark, path: str | None) -> None:
    """Enable reliable checkpointing for all iterative operators (pass
    ``None`` to revert to localCheckpoint)."""
    global _CHECKPOINT_DIR
    _CHECKPOINT_DIR = path
    if path is not None:
        spark.sparkContext.setCheckpointDir(path)


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage: reliable `.checkpoint()` when a checkpoint dir is
    configured (set_checkpoint_dir or SPARK_GRAFT_CHECKPOINT_DIR),
    executor-local `localCheckpoint` otherwise."""
    global _CHECKPOINT_DIR
    if _CHECKPOINT_DIR is None:
        env_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if env_dir:
            set_checkpoint_dir(df.sparkSession, env_dir)
    if _CHECKPOINT_DIR is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly, then unpersist the ``cached``
    intermediates it was built from. Returns the checkpointed result."""
    out = checkpoint(result, eager=True)
    for df in cached:
        df.unpersist()
    return out


def checkpoint_fresh_stats(df: DataFrame, eager: bool = True) -> DataFrame:
    """checkpoint() variant that also RESETS plan statistics.

    Spark 4's Dataset.checkpoint copies the source plan's statistics
    into the new LogicalRDD (LogicalRDD.rewriteStatsAndConstraints). In
    an iterative algorithm whose per-round plan JOINS the previous
    round's checkpoint several times, sizeInBytes therefore compounds
    as s_n ≈ s_{n-1}^k — the BigInteger doubles in bit-length every
    generation, and after ~30 chained checkpoints the stats visitors
    dominate planning (measured in minimum_spanning_forest: 300 s
    driver stalls on 1-row frames, then driver OOM inside
    BigInteger.multiply). Re-wrapping the SAME checkpointed
    RDD[InternalRow] through SparkSession.internalCreateDataFrame
    (package-private in Scala ⇒ public in bytecode, reachable via
    py4j) drops the inherited stats, so every generation restarts from
    the default estimate and the chain stays O(1) per round. Falls back
    to the plain checkpoint if the internal API is unavailable.

    Deep-loop operators (tens of checkpoint generations with joins —
    minimum_spanning_forest today) should use this; shallow loops keep
    plain checkpoint() so their measured join plans are untouched.
    """
    ck = checkpoint(df, eager=eager)
    try:
        from pyspark.sql import DataFrame as _DF

        jdf = ck._jdf
        qe = jdf.queryExecution()
        new_jdf = ck.sparkSession._jsparkSession.internalCreateDataFrame(
            qe.toRdd(), qe.analyzed().schema(), False
        )
        return _DF(new_jdf, ck.sparkSession)
    except Exception:  # Connect sessions / future internal-API changes
        return ck
