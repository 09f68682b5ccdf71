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


def session_window_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
) -> DataFrame:
    """Event-time SESSION windows per user (built-in session_window —
    dynamic-gap windows close after ``gap`` of inactivity). The streaming
    twin of the batch `rel_events_sessionize` query; watermark bounds the
    open-session state. Stays on the built-in operator: Catalyst handles
    the session merge, no custom state code needed."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col(user_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(user_col),
            "n_events",
            "total_value",
        )
    )


def stateful_user_counter(
    stream: DataFrame,
    timeout_minutes: int = 60,
    user_col: str = "user_id",
) -> DataFrame:
    """CUSTOM stateful operator via applyInPandasWithState — the escape
    hatch for semantics the built-in windows can't express (here: a
    per-user running event counter that emits a final row only when the
    user goes quiet for ``timeout_minutes`` of EVENT time, a
    user-lifecycle pattern session_window's fixed aggregate surface
    doesn't cover).

    State per user: (n_events, total_value, last_seen epoch-seconds).
    Arrow-batched, update-per-group, eviction on event-time timeout
    against the watermark — state stays bounded exactly like the built-in
    aggregations. Returns (user_id, n_events, total_value) on timeout.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n_events long, total_value double, last_seen long"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            n, tot, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [tot]}
            )
            return
        n, tot, last = (state.get if state.exists else (0, 0.0, 0))
        for pdf in pdfs:
            n += len(pdf)
            tot += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000_000))
        state.update((n, tot, last))
        state.setTimeoutTimestamp(last * 1000 + timeout_minutes * 60_000)
        yield pd.DataFrame({"user_id": [], "n_events": [], "total_value": []})

    return (
        stream.withWatermark("ts", f"{timeout_minutes} minutes")
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_time: str = "ts",
    right_time: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER join: each left event pairs with every right
    event for the same key within [left_time, left_time + within].

    Both sides carry a watermark and the join condition carries the time
    range — that pair is what lets Structured Streaming BOUND the join
    state: a buffered left row can be evicted once the right watermark
    passes left_time + within (Spark derives the state TTL from the
    range; without it, both sides buffer forever). This is the streaming
    twin of operators/temporal.interval_join — micro-batch state keyed
    by (key, time-bucket) instead of an exploded bucket join.

    ``right`` must already expose its event time as ``right_time``
    (rename before calling) so the joined schema never collides.
    """
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_time) >= F.col(left_time))
        & (F.col(right_time) <= F.col(left_time) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).drop(r[key])
