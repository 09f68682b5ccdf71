"""Deterministic dataset splitting & sampling for training pipelines.

A 100 TB corpus is carved into train/val/test and per-stratum samples as
a *pure function of content*, not of run order: the selector is a range
over the md5 hex digest (lexicographic on hex = uniform over 16^k), so
any engine — and any rerun after adding files — assigns the same row the
same way. This is the standard content-hash split trick (e.g. per-URL
hashing in web-corpus pipelines); md5 hex compares identically in Spark
and DuckDB, which also makes the operators oracle-checkable.

Everything is a map-side expression (no shuffle, no sort, no RNG state);
the only wide op in the demo queries is the final per-split aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(fraction: float, digits: int = 4) -> str:
    """Hex string h such that P(md5_prefix < h) ≈ fraction.

    fraction >= 1.0 returns 'g' — lexicographically above every hex
    digit, so `prefix < h` keeps ALL rows (a clamped 'ffff...' with a
    strict '<' would silently drop the ~16^-digits of rows whose prefix
    is exactly the maximum)."""
    if fraction >= 1.0:
        return "g"
    space = 16**digits
    return format(min(int(fraction * space), space - 1), f"0{digits}x")


def hash_split(
    df: DataFrame,
    key_col: str = "text",
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by md5(key) prefix range. Deterministic,
    engine-portable, stable under re-partitioning and corpus growth."""
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    out = F.when(prefix < F.lit(_hex_threshold(train)), "train").when(
        prefix < F.lit(_hex_threshold(train + val)), "val"
    ).otherwise("test")
    return df.withColumn(split_col, out)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str = "text",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its md5(key)
    prefix falls below the stratum's threshold. Rebalancing a skewed
    corpus (e.g. downsample the dominant language) without RNG state or
    a shuffle — selection is a codegen expression on the scan."""
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    thr: Column = F.lit(_hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_hex_threshold(frac))).otherwise(
            thr
        )
    return df.filter(prefix < thr)


def kmv_distinct(
    df: DataFrame, col: str, k: int = 256, out_col: str = "est_distinct"
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch: hash each value to a
    uniform (0,1) via its md5 prefix; with the k smallest DISTINCT hashes,
    the unbiased estimator is (k-1) / max(kth smallest hash).

    Unlike HLL, the estimate is a pure deterministic function of the
    value set — identical from any engine, run, or partitioning — so the
    sketch itself is oracle-checkable. At scale the k-smallest selection
    is a TakeOrdered (per-partition top-k then a k-row merge at one
    reducer), never a global sort; the sketch's merge (union of mins) is
    how per-split sketches would combine on a 1000-executor cluster.

    Returns one row: (n_sampled = k actually kept, est_distinct double).
    """
    # 12 hex chars = 48 bits: collision-free well past k·√N territory
    h = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )
    mins = df.select(h.alias("h")).filter(F.col("h") > 0).distinct().orderBy("h").limit(k)
    return mins.agg(
        F.count("*").alias("n_sampled"),
        # unsaturated sketch holds every distinct hash → exact count
        # (mirrors kmv_sketch_by / kmv_merge_sketches)
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise((F.count("*") - 1) / F.max("h"))
        .alias(out_col),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 100,
    key_col: str = "text",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws u ∈ (0,1) from its content hash and
    keys on u^(1/w); the global top-k by key is the weighted sample.

    No RNG state — the sample is a pure function of (content, weight), so
    reruns, engines and partitionings agree. Top-k is a TakeOrdered (no
    global sort). Returns the sampled rows with the sort key attached.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.withColumn("sample_key", key)
        .filter(F.col(weight_col) > 0)
        .orderBy(F.desc("sample_key"))
        .limit(k)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    key_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture resampling (the multilingual/multi-domain
    p^α trick): with corpus shares p_g, the target mixture is
    q_g ∝ p_g^α (α<1 flattens toward uniform, α=1 is a no-op). Realized
    by per-row filtering without replacement, so keep fractions are
    f_g = (n_g / n_min)^(α-1), normalized to 1 on the SMALLEST domain —
    rare domains keep everything, dominant domains downsample.

    Selection is the same content-hash uniform as stratified_sample
    (u = md5-prefix / 16^12 < f_g): deterministic, RNG-free, stable under
    repartitioning. Plan: one #domains-row aggregate (a global window
    over that tiny frame, never over rows) broadcast-joined back, then a
    map-side filter — at 100 TB the only wide op is the domain count.

    Returns the kept rows with ``__keep_frac`` attached.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy()  # #domains rows only — never row-level
    fracs = counts.select(
        group_col,
        F.col("__n"),
        F.pow(F.col("__n") / F.min("__n").over(w), F.lit(alpha - 1.0)).alias(
            "__keep_frac"
        ),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )
    return (
        df.join(F.broadcast(fracs.drop("__n")), group_col)
        .filter(u < F.col("__keep_frac"))
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    fractions: list | None = None,
    sample_frac: float = 0.1,
) -> DataFrame:
    """Quantile estimation from a DETERMINISTIC hash sample: keep rows
    whose md5(key) prefix falls under ``sample_frac``, then exact
    interpolated percentiles on the sample. The 100 TB stats pattern —
    a full-column exact percentile needs a global sort, a hash sample
    reads ~frac of the data and (unlike Spark's RNG sampling or
    approx_percentile) is a pure function of the keys: reruns, engines
    and partitionings produce the IDENTICAL estimate, so even the
    sketch is oracle-checkable.

    Returns one row per fraction: (quantile, value, n_sampled).
    """
    fractions = fractions or [0.25, 0.5, 0.75, 0.9]
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    sample = df.filter(prefix < F.lit(_hex_threshold(sample_frac)))
    rows = []
    agg = sample.agg(
        F.count("*").alias("n_sampled"),
        *[
            F.expr(f"percentile({value_col}, {q})").alias(f"q{i}")
            for i, q in enumerate(fractions)
        ],
    )
    out = None
    for i, q in enumerate(fractions):
        row = agg.select(
            F.lit(q).alias("quantile"),
            F.col(f"q{i}").alias("value"),
            F.col("n_sampled"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join-key skew diagnostics — the report that decides whether a key
    needs salting/AQE-skew-join before a 100 TB shuffle: per-key counts
    reduced to (top-k heaviest keys, their corpus share, and the
    max/mean ratio). One partial-agg groupBy + a TakeOrdered; the
    whole-table stats ride the same aggregate.

    Returns top_k rows: (rank, key, n_rows, share, max_mean_ratio) —
    the ratio column is constant (table-level) for convenience.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").alias("total"),
        F.avg("n_rows").alias("mean"),
        F.max("n_rows").alias("mx"),
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(w).cast("int").alias("rank"),
            "key",
            "n_rows",
            (F.col("n_rows") / F.col("total")).alias("share"),
            (F.col("mx") / F.col("mean")).alias("max_mean_ratio"),
        )
        .orderBy("rank")
    )


def _kmv_hash(col: str):
    # 12 hex chars = 48 bits, normalized to (0,1] — same construction as
    # kmv_distinct so the two sketches interoperate
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16**12))
    )


def kmv_sketch_by(
    df: DataFrame, col: str, group_cols: list, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count sketch — the MERGEABLE form of
    kmv_distinct (one fixed-size sketch per group instead of one global
    estimate). Returns (group…, sketch array<double> ascending ≤k,
    n_kept, est_distinct).

    Keeping the k smallest distinct hashes per group is exact under
    merge: every one of a superset's k smallest hashes is within its
    own subset's k smallest, so union-of-sketches → k-min reproduces
    the sketch a direct pass over the union would build. That is the
    map-side-combine contract a 1000-executor rollup needs: per-split
    sketches (k doubles each) travel the shuffle, never the raw values.

    The per-group top-k is TWO-STAGE so no sort ever sees a whole
    group's hash set (a group with 10⁹ distinct values would otherwise
    pay a full per-group sort to keep 64 of them): stage 1 keeps the k
    smallest within (group, spark_partition_id()) — each window
    partition is bounded by one task's slice of one group — and stage 2
    re-selects the k smallest of the ≤ k×P survivors per group. Each of
    a group's k smallest hashes is among the k smallest of its own
    partition's subset, so the result is identical to the single-stage
    build (hash-asserted in tests). est_distinct uses the (k−1)/h_k
    estimator only when the sketch is SATURATED; an unsaturated sketch
    holds every distinct hash, so n_kept is exact and is returned as-is.
    """
    from pyspark.sql import Window

    pairs = (
        df.select(*group_cols, _kmv_hash(col).alias("h"))
        .filter(F.col("h") > 0)
        .distinct()
    )
    w1 = Window.partitionBy(*group_cols, "__pid").orderBy("h")
    pre = (
        pairs.withColumn("__pid", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn", "__pid")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = pre.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return kept.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count("*").alias("n_kept"),
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise((F.count("*") - 1) / F.max("h"))
        .alias("est_distinct"),
    )


def kmv_merge_sketches(
    sketches: DataFrame, group_cols: list, k: int = 64
) -> DataFrame:
    """Merge KMV sketches to a coarser grouping (e.g. nation → region):
    explode the fixed-size sketch arrays, distinct, and re-select the k
    smallest per new group — exactly the sketch of the merged value
    sets (see kmv_sketch_by). Input rows are sketches, so the merge
    moves O(groups × k) doubles regardless of raw cardinality.
    est_distinct mirrors kmv_sketch_by: exact n_kept below saturation,
    (k−1)/h_k once the sketch is full."""
    from pyspark.sql import Window

    ex = (
        sketches.select(*group_cols, F.explode("sketch").alias("h")).distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = ex.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return kept.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count("*").alias("n_kept"),
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise((F.count("*") - 1) / F.max("h"))
        .alias("est_distinct"),
    )
