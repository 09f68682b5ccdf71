"""Event-time windowed aggregation with watermarks.

The reference has NO event-time semantics — no watermarks, no windows, no
late-data handling (SURVEY §2.6): its "streaming" is append-only ingest
with repeated batch counts. This module supplies the streaming surface a
training-data pipeline actually needs, on Structured Streaming:

 * tumbling/sliding event-time windows over the event stream,
 * watermarked state eviction (bounded state at 100 TB/day rates),
 * late-data tolerance up to the watermark delay.

The batch-mode twins of these aggregations are `rel_events_hourly` /
`rel_events_sessionize` in __spark_entry__ (identical expressions — a
micro-batch is just a small batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding) counts + value sums per (window, event_type).

    The watermark bounds aggregation state: windows older than
    max(event_time) - watermark are finalized and evicted — without it,
    state grows unboundedly at stream scale.
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list | None = None,
    text_col: str = "text",
    watermark_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming deduplication — the streaming twin of
    pipeline.dedup.exact_dedup: drop records whose content hash was
    already seen, with dedup state bounded by the watermark (a duplicate
    arriving later than the delay is treated as new — the standard
    state-size/completeness trade at stream scale).
    """
    keyed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    keys = key_cols or ["content_hash"]
    # dropDuplicatesWithinWatermark evicts per-key state once the key's
    # event time falls behind the watermark; plain dropDuplicates(keys)
    # only evicts when the event-time column is part of the key subset,
    # so its state would grow unboundedly here.
    return keyed.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_to_batch(stream_df: DataFrame, checkpoint: str, out_path: str):
    """Drain a (file-backed) stream with availableNow into parquet —
    the test/bootstrap harness for streaming aggregations; swap the
    source for Kafka and the trigger for a processing-time interval in
    production."""
    return (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
