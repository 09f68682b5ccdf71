"""Write-layout optimizers: small-file compaction and Z-order clustering.

At 100 TB the dominant cost of a table is how it lies on disk:

 * streaming ingest and over-parallel writes leave thousands of KB-scale
   files — every query then pays per-file open/footer costs and the
   scheduler pays per-split overhead. :func:`compact_parquet` rewrites a
   directory into size-targeted files.
 * multi-dimensional filters (user AND time; lat AND lon) can't both be
   served by a single sort order. :func:`zorder_by` interleaves the bits
   of the filter columns into one Z-value and range-partitions/sorts by
   it, so parquet row-group min/max stats become selective on EVERY
   z-ordered column at once — the same technique Delta/Iceberg expose as
   OPTIMIZE ZORDER, built here from pure expressions.

Both are plain DataFrame jobs: no custom committers, no table format —
they produce standard parquet readable by any engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ZBITS = 21  # 3 cols × 21 bits = 63 bits < long; 2M buckets per dim


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_mb`` files.

    File count = ceil(input_bytes / target). Uses repartition (round-
    robin, even output sizes) — NOT coalesce, which merges planning
    splits without redistributing and inherits input skew. Returns a
    {files_before, files_after, bytes} report. Input sizing comes from
    the filesystem, not a scan."""
    def _dir_stats(p):
        n, total = 0, 0
        for root, _, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    total += os.path.getsize(os.path.join(root, f))
        return n, total

    files_before, total_bytes = _dir_stats(src_path)
    n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.repartition(int(n_out)).write.mode("overwrite").parquet(dst_path)
    files_after, _ = _dir_stats(dst_path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }


def _interleave_bits(cols: list, bits: int = _ZBITS):
    """Bit-interleave pre-normalized [0, 2^bits) long columns into one
    Z-value: output bit (b*len + i) takes bit b of column i. Pure
    shiftleft/bitwise-or expressions — codegen-friendly, no UDF."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


_ZQ_BITS = 8  # 256 quantile buckets per dim — tight file envelopes at any n_files ≪ 256


def _bucket_search(c, bounds: list, lo: int, hi: int):
    """Balanced binary-search WHEN-tree assigning ``c`` its bucket in
    [lo, hi] given sorted split points ``bounds`` (bucket i holds values
    in [bounds[i-1], bounds[i])). Each row evaluates only the tree DEPTH
    (log2 #buckets ≈ 8) comparisons — pure codegen, no UDF, no sort."""
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(c < F.lit(bounds[mid]), _bucket_search(c, bounds, lo, mid)).otherwise(
        _bucket_search(c, bounds, mid + 1, hi)
    )


def _zorder_surrogate(dtype: str, c):
    """Order-preserving numeric surrogate for a z-order column, so the
    approxQuantile sketch (numeric-only) covers the common clustering key
    types: numerics pass through, date/timestamp become epoch seconds,
    strings map to their first-6-byte big-endian integer (exact in a
    double: 2^48 < 2^53; approximately lexicographic, which is all bucket
    assignment needs). Anything else fails loudly."""
    if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith(
        "decimal"
    ):
        return c.cast("double")
    if dtype == "boolean":
        return c.cast("int").cast("double")
    if dtype == "date":
        return c.cast("timestamp").cast("double")
    if dtype.startswith("timestamp"):
        return c.cast("double")
    if dtype == "string":
        return F.conv(F.hex(F.rpad(F.substring(c, 1, 6), 6, "\x00")), 16, 10).cast("double")
    raise ValueError(
        f"zorder_by: unsupported column type {dtype!r} — cast it to a "
        "numeric/date/timestamp/string column first"
    )


def zorder_by(df: DataFrame, cols: list, n_files: int = 8) -> DataFrame:
    """Cluster rows by the Z-order (Morton) curve over ``cols``.

    Each column is rank-normalized to [0, 2^8) buckets via ONE
    ``approxQuantile`` pass over ALL the z-columns together
    (Greenwald-Khanna sketch: distributed, single scan, nothing ever
    sorts globally) — rank (not min/max scaling) makes the curve robust
    to skewed value distributions — then mapped to its bucket with a
    log-depth comparison tree and bit-interleaved; repartitionByRange +
    in-partition sort on the Z-value gives every output file a tight
    min/max envelope on ALL the z-columns, so predicate pushdown prunes
    files for conjunctive AND cross-column filters alike. 256 buckets/dim
    bound every stage at 100 TB: the sketch is one pass, the bucket map
    is 8 comparisons per row, and only the final per-file sort touches
    row order (and only within output files). Non-numeric key types ride
    an order-preserving numeric surrogate (_zorder_surrogate); an
    all-null/empty column degrades to bucket 0 instead of crashing the
    bucket search.
    """
    n_buckets = 1 << _ZQ_BITS
    probs = [i / n_buckets for i in range(1, n_buckets)]
    dtypes = dict(df.dtypes)
    work = df
    for i, c in enumerate(cols):
        work = work.withColumn(f"__zsrc{i}", _zorder_surrogate(dtypes[c], F.col(c)))
    surrogate_cols = [f"__zsrc{i}" for i in range(len(cols))]
    # one sketch pass for every dimension at once
    all_bounds = work.approxQuantile(surrogate_cols, probs, 1.0 / (4 * n_buckets))
    normed = []
    for i, bounds in enumerate(all_bounds):
        sc = F.col(f"__zsrc{i}")
        if not bounds:  # empty/all-null column — no quantiles to split on
            bucket = F.lit(0)
        else:
            bucket = F.when(sc.isNull(), F.lit(0)).otherwise(
                _bucket_search(sc, bounds, 0, n_buckets - 1)
            )
        work = work.withColumn("__z%d" % i, bucket.cast("long"))
        normed.append(F.col(f"__z{i}"))
    work = work.withColumn("__zvalue", _interleave_bits(normed, bits=_ZQ_BITS)).drop(
        *surrogate_cols
    )
    out = (
        work.repartitionByRange(n_files, "__zvalue")
        .sortWithinPartitions("__zvalue")
        .drop("__zvalue", *[f"__z{i}" for i in range(len(cols))])
    )
    return out


def zorder_prune_stats(
    spark: SparkSession, path: str, col: str, lo, hi
) -> dict:
    """Measure what Z-ordering actually buys on disk: read the parquet
    footers of ``path`` and count how many FILES could be skipped for the
    range predicate ``lo <= col <= hi`` from their min/max stats alone —
    the exact decision Spark's parquet reader makes when pushing the
    filter down. Footer-only (one tiny read per file, no row data), so
    it's a valid probe at any table size. Returns {n_files, n_skippable,
    skip_ratio}."""
    import pyarrow.parquet as pq

    n_files, n_skippable = 0, 0
    for root, _, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            n_files += 1
            md = pq.read_metadata(os.path.join(root, fname))
            overlaps = False
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                for ci in range(grp.num_columns):
                    cc = grp.column(ci)
                    if cc.path_in_schema != col:
                        continue
                    st = cc.statistics
                    if st is None or not st.has_min_max:
                        overlaps = True  # no stats → cannot skip
                    elif not (st.max < lo or st.min > hi):
                        overlaps = True
            if not overlaps:
                n_skippable += 1
    return {
        "n_files": n_files,
        "n_skippable": n_skippable,
        "skip_ratio": round(n_skippable / n_files, 4) if n_files else 0.0,
    }


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list,
) -> None:
    """Hive-partitioned dataset write (dataset-release layout: one
    directory tree keyed by e.g. lang/split so consumers read only the
    slices they need via partition pruning — the coarse cousin of
    Z-ordering).

    Repartitions by the partition columns first so each output directory
    is written by few tasks (without it, every task can open a writer in
    every partition → small-file explosion: tasks × partitions files).
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
