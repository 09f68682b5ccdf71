"""Deterministic cache lifecycle for multi-pass operators.

Iterative/multi-reference operators persist their hot intermediates
(edge sets, adjacency, signatures) so one materialization feeds many
joins. In a long-lived engine session those persists must be RELEASED
when the operator finishes, or repeated analytics calls pin executor
storage until eviction thrash (the reference frees its per-query local
stores the same way when the executor completes).

`finalize(result, *cached)` is the contract: materialize the result once
(eager localCheckpoint — also truncates the lineage so the result no
longer references the caches), then unpersist every intermediate. The
returned frame serves any number of downstream actions from its
checkpoint blocks without recomputation.

At cluster scale swap localCheckpoint for a reliable checkpoint
(`spark.sparkContext.setCheckpointDir` + `.checkpoint()`) so executor
loss cannot drop result partitions — see SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly, then unpersist the ``cached``
    intermediates it was built from. Returns the checkpointed result."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out
