"""Skew-handling helpers for hot keys.

AQE's skew-join splitting handles join-side skew automatically (enabled in
session.get_spark); these helpers cover the remaining case: *aggregation*
skew, where one group key holds a disproportionate share of rows and its
single reducer becomes the stage straggler.

Two-phase salted aggregation: append a random salt to the key, partially
aggregate (salted key) so the hot key spreads over ``salt`` reducers, then
aggregate the partials by the true key. Works for any algebraic aggregate
(sum/count/min/max — supply the merge expression for others).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list,
    aggs: dict[str, tuple[Column, "str"]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    ``aggs``: name → (partial aggregate Column, merge function name) where
    the merge is the re-aggregation over partials ('sum' for sum/count,
    'min'/'max' for min/max).

        salted_agg(df, ["k"], {"n": (F.count("*"), "sum"),
                               "total": (F.sum("v"), "sum"),
                               "mx": (F.max("v"), "max")})

    The salt column is random but only affects intermediate partitioning —
    results are exact. At 1000 executors this turns a hottest-key stage
    from one straggling reducer into ``salt`` parallel partials.
    """
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, (c, _m) in aggs.items()]
    )
    final = partial.groupBy(*key_cols).agg(
        *[
            merge_fns[m](F.col(f"__p_{name}")).alias(name)
            for name, (_c, m) in aggs.items()
        ]
    )
    return final
