"""Cross-concept comparison checks.

Reference: evaluate_comparison (R/evaluate_comparison.R:49-192) — a lookup
table of (concept_a, concept_b, operator) constraints, evaluated on a
full-outer join of the two extracted concepts, with operators
exists / not_exists / == / != / < / <= / > / >= (e.g. systolic > diastolic,
death date and death time must co-exist).
"""

from __future__ import annotations

import operator as _op
from dataclasses import dataclass
from functools import reduce
from typing import Mapping

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


@dataclass(frozen=True)
class Comparison:
    """One row of the comparisons lookup (the reference's
    .comparisons_lookup tibble, data-raw/write_internal_data.R:284-294):
    name is the emitted check_code."""

    name: str
    code_a: str
    code_b: str
    op: str


def evaluate_comparisons(
    extracts: Mapping[str, DataFrame],
    lookup: list[Comparison],
    keys: list[str],
    value_col: str = "value",
    eval_code: str = "VE_AP_01",
) -> DataFrame:
    """Lookup-driven comparison battery with failure decomposition.

    Reference: evaluate_comparison (R/evaluate_comparison.R:49-192) — pmap
    over the lookup rows, each violation set is semi-joined back to BOTH
    source extracts so per-event failure rows are emitted for each side
    (:101-124). An `exists` violation decomposes to side-a rows only (side
    b has no row for those keys by definition — the semi-join is naturally
    empty).

    Output: (keys..., code_name, value, check_code, eval_code) — one row
    per (violating key, participating side). The extracts dict is the
    analog of the reference's comparisons_storage cache
    (R/perform_evaluation.R:285-311); pass pre-cached frames when several
    comparisons share an extract. All joins are keyed equi-joins; violation
    key sets are at most extract-sized and typically tiny → AQE broadcasts
    them.
    """
    parts: list[DataFrame] = []
    for c in lookup:
        viol = compare_pair(
            extracts[c.code_a], extracts[c.code_b], keys, c.op, value_col
        ).select(*keys).distinct()
        for code in (c.code_a, c.code_b):
            parts.append(
                extracts[code]
                .join(viol, keys, "leftsemi")
                .select(
                    *keys,
                    F.lit(code).alias("code_name"),
                    F.col(value_col).cast("string").alias("value"),
                    F.lit(c.name).alias("check_code"),
                    F.lit(eval_code).alias("eval_code"),
                )
            )
    return reduce(DataFrame.unionByName, parts)


def _violation_cond(c: Comparison, a, b):
    if c.op == "exists":
        return a.isNotNull() & b.isNull()
    if c.op == "not_exists":
        return a.isNotNull() & b.isNotNull()
    if c.op in _BINARY_OPS:
        return a.isNotNull() & b.isNotNull() & ~_BINARY_OPS[c.op](a, b)
    raise ValueError(f"unknown comparison operator: {c.op}")


def evaluate_comparisons_wide(
    wide: DataFrame,
    lookup: list[Comparison],
    keys: list[str],
    eval_code: str = "VE_AP_01",
) -> DataFrame:
    """Single-pass variant of evaluate_comparisons over the PIVOTED frame
    (one column per code, NULL where the concept is absent — which is
    exactly what the reference's full-outer join materializes).

    Every violation condition and both decomposed sides are computed as
    columns in one projection and exploded to the long failure form: ONE
    scan and ZERO joins, where the extract-dict formulation plans
    2×|lookup| joins and re-derives the extracts per side (measured 36
    parquet scans / 72 exchanges for a 3-rule lookup — the dict API
    remains for reference-shaped composition over pre-cached extracts;
    this is the plan you want at scale). Output identical.
    """
    structs = []
    for c in lookup:
        cond = _violation_cond(c, F.col(c.code_a), F.col(c.code_b))
        for code in (c.code_a, c.code_b):
            col = F.col(code)
            structs.append(
                F.when(
                    cond & col.isNotNull(),
                    F.struct(
                        F.lit(code).alias("code_name"),
                        col.cast("string").alias("value"),
                        F.lit(c.name).alias("check_code"),
                        F.lit(eval_code).alias("eval_code"),
                    ),
                )
            )
    exploded = wide.select(
        *keys,
        F.explode(
            F.filter(F.array(*structs), lambda x: x.isNotNull())
        ).alias("f"),
    )
    return exploded.select(
        *keys,
        F.col("f.code_name").alias("code_name"),
        F.col("f.value").alias("value"),
        F.col("f.check_code").alias("check_code"),
        F.col("f.eval_code").alias("eval_code"),
    )
