"""Predicate semantics matching the reference's literal-driven coercion.

The reference stores every property value as a string and types it at
predicate-evaluation time from the *literal* on the other side of the
comparison: DECIMAL → stoi, BOOLEAN → "true"/"false", NULL, STRING
(src/query/processor/cypher/runtime/Helpers.cpp:197-236,274-290). Missing
properties evaluate to null (Helpers.cpp:204-210).

Here the same rule becomes a cast on the property Column chosen from the
Python literal's type — evaluated JVM-side by Catalyst, so the coercion
costs nothing and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {
    "==": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
}


def prop(var: str, key: str) -> Column:
    """``n.prop`` lookup — map access; missing key → null
    (Helpers.cpp:204-210 semantics, free with MapType access)."""
    return F.col(f"{var}.properties")[key]


def coerce_for(literal) -> str | None:
    """Spark cast type implied by the literal (Helpers.cpp:197-236)."""
    if isinstance(literal, bool):
        return "boolean"
    if isinstance(literal, int):
        return "bigint"
    if isinstance(literal, float):
        return "double"
    return None  # string / null: compare as-is


def coerced_compare(col: Column, op: str, literal) -> Column:
    """Typed compare after literal-driven coercion.

    `n.age > 25` with string-stored "30" casts the property to bigint —
    exactly the reference's stoi path (Helpers.cpp:73-88). A null (missing
    property or failed cast) makes the comparison null → row filtered out,
    matching the reference's false-on-missing behavior.
    """
    cast_t = coerce_for(literal)
    lhs = col.cast(cast_t) if cast_t else col
    if literal is None:
        # IS NULL / IS NOT NULL mapped onto ==/<> against null
        # (Operators.cpp:197-208)
        return lhs.isNull() if op == "==" else lhs.isNotNull()
    return _OPS[op](lhs, F.lit(literal))


def logical(op: str, *cols: Column) -> Column:
    """N-ary AND/OR/XOR/NOT (Helpers.cpp:134-168). NOT here actually
    negates — the reference's NOT forgetting to negate is a known bug we do
    not reproduce (SURVEY §2.2)."""
    if op == "NOT":
        (c,) = cols
        return ~c
    it = iter(cols)
    acc = next(it)
    for c in it:
        if op == "AND":
            acc = acc & c
        elif op == "OR":
            acc = acc | c
        elif op == "XOR":
            acc = acc != c
        else:
            raise ValueError(f"unknown logical op {op}")
    return acc
