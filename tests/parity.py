"""Driver-mirror comparison: Spark query vs DuckDB oracle.

Replicates the driver's t2 gate (row-count + schema-shape + order-
insensitive value comparison) so mismatches surface locally before a
round's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns (stringified for a
    total order across types/nulls)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row counts differ: spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if _eq(x, y):
                continue
            problems.append(f"col {col} row {i}: spark={x!r} oracle={y!r}")
            if len(problems) >= 5:
                return problems
    return problems


def _eq(x, y) -> bool:
    xn = x is None or (isinstance(x, float) and math.isnan(x))
    yn = y is None or (isinstance(y, float) and math.isnan(y))
    if xn or yn:
        return xn and yn
    if isinstance(x, float) or isinstance(y, float):
        try:
            return float(x) == float(y) or math.isclose(float(x), float(y), rel_tol=0, abs_tol=0.0)
        except (TypeError, ValueError):
            return False
    return str(x) == str(y)
