"""Cross-concept comparison checks.

Reference: evaluate_comparison (R/evaluate_comparison.R:49-192) — a lookup
table of (concept_a, concept_b, operator) constraints, evaluated on a
full-outer join of the two extracted concepts, with operators
exists / not_exists / == / != / < / <= / > / >= (e.g. systolic > diastolic,
death date and death time must co-exist).
"""

from __future__ import annotations

import operator as _op

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BINARY_OPS = {
    "==": _op.eq,
    "!=": _op.ne,
    "<": _op.lt,
    "<=": _op.le,
    ">": _op.gt,
    ">=": _op.ge,
}


def compare_pair(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    op: str,
    value_col: str = "value",
) -> DataFrame:
    """Keyed rows violating `a.value <op> b.value`, or existence
    constraints, on the full-outer join of the two sides.

    Returns the join keys plus both values (value_a, value_b). For binary
    ops, rows where either side is NULL yield no verdict (reference NA
    semantics); for exists/not_exists NULL-ness IS the verdict:

    - "exists":      a present but b absent  → violation
    - "not_exists":  a present and b present → violation
    """
    av = a.select(*keys, F.col(value_col).alias("value_a"))
    bv = b.select(*keys, F.col(value_col).alias("value_b"))
    joined = av.join(bv, keys, "full")

    if op == "exists":
        cond = F.col("value_a").isNotNull() & F.col("value_b").isNull()
    elif op == "not_exists":
        cond = F.col("value_a").isNotNull() & F.col("value_b").isNotNull()
    elif op in _BINARY_OPS:
        ok = _BINARY_OPS[op](F.col("value_a"), F.col("value_b"))
        cond = F.col("value_a").isNotNull() & F.col("value_b").isNotNull() & ~ok
    else:
        raise ValueError(f"unknown comparison operator: {op}")
    return joined.filter(cond)
