"""Temporal joins Spark lacks as built-ins, expressed with built-ins.

The as-of join (each left row picks the LATEST right row at-or-before
its timestamp, per key) is the backbone of event/state enrichment —
trades↔quotes, events↔dimension-history. Naive formulations are range
joins (per-row inequality → BroadcastNestedLoopJoin or an exploded
interval join); this implementation is the union-and-window technique:

  1. tag both inputs and UNION them on (keys, time);
  2. one window per key ordered by (time, side) — right rows sort before
     left rows at equal timestamps, giving inclusive `right.t <= left.t`;
  3. `last(value, ignorenulls=True)` carries the latest right values
     forward to each left row;
  4. keep left rows.

Cost: ONE shuffle on the key columns + a sorted window pass — linear,
skew-bounded by the hottest key, no nested loop anywhere (plan-asserted
in tests/test_plans.py). A `tolerance` bound post-filters matches older
than the window (rows keep their null-extended shape, like ASOF LEFT
JOIN semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance=None,
) -> DataFrame:
    """ASOF LEFT JOIN: every row of ``left`` gains the ``value_cols`` of
    the latest ``right`` row with the same ``on`` keys and
    ``right_time <= left_time`` (inclusive), plus ``<right_time>{suffix}``
    — null-extended when no prior right row exists.

    ``tolerance`` (seconds, or anything comparable after casting the time
    difference) nulls out matches staler than the bound.

    The right side must be deterministic per (keys, time): pre-aggregate
    duplicates upstream, or the carried value is order-dependent.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    lcols = [c for c in left.columns]
    l = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols if c not in on],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_time).alias("__rt"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *on,
        "__t",
        "__side",
        *[F.col(f"__l_{c}") for c in lcols if c not in on],
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}") for c in value_cols],
        F.last("__rt", ignorenulls=True).over(w).alias("__c_rt"),
    ).filter(F.col("__side") == 1)
    within = F.lit(True)
    if tolerance is not None:
        within = (
            F.col("__t").cast("double") - F.col("__c_rt").cast("double")
        ) <= F.lit(tolerance)
    out_vals = [
        F.when(within, F.col(f"__c_{c}")).alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.select(
        *on,
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in on],
        *out_vals,
        F.when(within, F.col("__c_rt")).alias(f"{right_time}{suffix}"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key: each point row matches
    every interval row with ``start <= t < end``.

    Spark's planner turns a pure-inequality join into a
    BroadcastNestedLoopJoin (O(|P|·|I|) comparisons and a broadcast of a
    whole side) — fatal when both sides are large. This is the standard
    bucketed decomposition instead:

      1. points get ONE bucket: floor(epoch / bucket_seconds);
      2. intervals EXPLODE into every bucket they overlap
         (sequence(floor(start/b), floor((end-ε)/b)));
      3. shuffle hash equi-join on the bucket, then the exact
         ``start <= t < end`` residual as a post-join filter.

    Each (point, interval) pair meets in exactly one bucket — the point's
    — so no dedup pass is needed. Cost: one explode whose factor is
    interval_length/bucket_seconds (pick the bucket near the median
    interval length) + one hash shuffle on uniformly-distributed bucket
    ids. At 100 TB both sides partition cleanly; a hot bucket (all
    intervals covering one hour) is AQE-skew-join territory, same as any
    hot key. Plan-asserted BNLJ-free in tests/test_plans.py.
    """
    b = F.lit(bucket_seconds)
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_time).cast("double") / b).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b).cast("long"),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into that bucket
                F.floor((F.col(end_col).cast("double") - F.lit(1e-9)) / b).cast("long"),
            )
        ),
    )
    joined = p.join(i, "__bucket").filter(
        (F.col(point_time) >= F.col(start_col)) & (F.col(point_time) < F.col(end_col))
    )
    return joined.drop("__bucket")


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture stream to a snapshot — MERGE INTO
    semantics without a transactional table format:

      * per key, the LATEST change (by ``ts_col``, then ``op_col`` as a
        deterministic tie-break) wins;
      * op 'D' deletes the key; 'I'/'U' upsert the change's values;
      * keys untouched by the stream keep their snapshot row.

    One row_number window on the change stream (shuffle keyed on the
    merge keys) + one full-outer join against the snapshot — exactly the
    shuffle a Delta/Iceberg MERGE plans, so swapping a real table format
    in later changes nothing upstream. Output schema = snapshot schema.
    """
    value_cols = [c for c in snapshot.columns if c not in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.desc(op_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__c_{c}") for c in value_cols],
        )
    )
    joined = snapshot.join(latest, key_cols, "full_outer")
    merged = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != F.lit("D"))
    ).select(
        *key_cols,
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
    )
    return merged
