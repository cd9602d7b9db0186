"""Row-level predicate checks (the "rule battery").

Reference semantics (R/evaluate_ranges.R, R/evaluate_metadata.R) recast as
native column expressions — no UDFs anywhere in this module, so every check
stays inside whole-stage codegen and its predicate is eligible for
parquet/Iceberg pushdown when applied directly after a scan.

Design note (scale): the reference runs 255 sequential single-code scans
(R/perform_evaluation.R:294-467). Here every check is a column predicate on
ONE shared scan; `run_battery` composes them into a single pass that emits
all failure flags at once and explodes to the long failure-log form. At
100 TB that is the difference between 1 scan and N scans.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inspectehr_spark.rules import Rule
from inspectehr_spark.schemas import make_failure_log


def range_violation(col: Column, rule: Rule) -> Column:
    """TRUE iff the value is present and OUTSIDE the rule interval.

    NULL values yield no verdict (reference NA passthrough,
    R/evaluate_ranges.R:61-66): NULL-ness is the metadata check's job.
    Reference: evaluate_range numeric impl R/evaluate_ranges.R:47-93.
    """
    lo_ok = (col >= rule.lo) if rule.lo_incl else (col > rule.lo)
    hi_ok = (col <= rule.hi) if rule.hi_incl else (col < rule.hi)
    if math.isinf(rule.lo):
        lo_ok = F.lit(True)
    if math.isinf(rule.hi):
        hi_ok = F.lit(True)
    return col.isNotNull() & ~(lo_ok & hi_ok)


def set_violation(col: Column, rule: Rule) -> Column:
    """TRUE iff value not in the allowed set; NULL → no verdict.
    Reference: evaluate_range string-set, R/evaluate_ranges.R:105-187."""
    return col.isNotNull() & ~col.isin(*rule.possible_values)


def pattern_violation(col: Column, rule: Rule) -> Column:
    """TRUE iff value does not match the conformance regex.
    Reference: evaluate_post_code, R/evaluate_ranges.R:200-222."""
    return col.isNotNull() & ~col.rlike(rule.pattern)


# Pinned default bounds for temporal rules that give only one side.
# NEVER current_timestamp(): a wall-clock bound makes the same battery over
# the same data yield different failure logs across runs, breaking
# replay/resume idempotence and oracle parity (ADVICE r2 #2). A rule that
# really wants "no future timestamps" must pin its own ts_hi.
TS_DEFAULT_LO = "1900-01-01 00:00:00"
TS_DEFAULT_HI = "2100-01-01 00:00:00"


def temporal_violation(col: Column, lo: str = TS_DEFAULT_LO, hi: Column | None = None) -> Column:
    """TRUE iff timestamp outside [lo, hi] (hi defaults to the pinned
    TS_DEFAULT_HI spec constant — deterministic, never wall-clock).
    Reference: evaluate_range.date/datetime_1d, R/evaluate_ranges.R:282-367."""
    hi = hi if hi is not None else F.lit(TS_DEFAULT_HI).cast("timestamp")
    return col.isNotNull() & ~col.between(F.lit(lo).cast("timestamp"), hi)


def metadata_violation(meta_cols: list[str]) -> Column:
    """TRUE iff ANY metadata column is NULL.
    Reference: evaluate_metadata, R/evaluate_metadata.R:14-35."""
    cond = F.lit(False)
    for m in meta_cols:
        cond = cond | F.col(m).isNull()
    return cond


def cross_column_violation(col: Column, rule: Rule) -> Column:
    """TRUE iff the two columns disagree; either side NULL → no verdict.
    (The langid-vs-declared-lang check; reference analog is the
    co-existence/equality branch of evaluate_comparison,
    R/evaluate_comparison.R:86-99, applied within one row.)"""
    return col != F.col(rule.not_equals_column)


def flag_violation(col: Column) -> Column:
    """The column IS the verdict (precomputed boolean, e.g. is_duplicate)."""
    return col.isNotNull() & col


def ts_bounds_violation(col: Column, rule: Rule) -> Column:
    """TRUE iff timestamp outside [ts_lo, ts_hi]; NULL → no verdict. An
    unset side falls back to the pinned TS_DEFAULT_LO/HI constants — never
    current_timestamp(), which would make verdicts wall-clock dependent
    (same data, different failure log across runs; ADVICE r2 #2).
    Reference: evaluate_range.date/datetime_1d, R/evaluate_ranges.R:282-367."""
    c = col.cast("timestamp")
    lo = F.lit(rule.ts_lo or TS_DEFAULT_LO).cast("timestamp")
    hi = F.lit(rule.ts_hi or TS_DEFAULT_HI).cast("timestamp")
    return c.isNotNull() & ~c.between(lo, hi)


def violation_for(rule: Rule) -> Column:
    """Dispatch a Rule to its predicate — the Python-dict analog of the
    reference's S3 method dispatch (R/evaluate_events.R:39-87).

    Raises on rules this module cannot express rather than silently
    compiling a never-true predicate (a rule with no interval, set, pattern,
    cross-column or flag spec would otherwise degrade to ±inf bounds)."""
    col = F.col(rule.column)
    if rule.possible_values:
        return set_violation(col, rule)
    if rule.pattern:
        return pattern_violation(col, rule)
    if rule.not_equals_column:
        return cross_column_violation(col, rule)
    if rule.flag:
        return flag_violation(col)
    if rule.ts_lo or rule.ts_hi:
        return ts_bounds_violation(col, rule)
    if math.isinf(rule.lo) and math.isinf(rule.hi):
        raise ValueError(
            f"rule {rule.check_code!r} has no expressible predicate "
            "(no bounds, set, pattern, cross-column or flag)"
        )
    return range_violation(col, rule)


def check_rule(df: DataFrame, rule: Rule, **log_kw) -> DataFrame:
    """Single-rule check → failure log. Filter stays native so Catalyst can
    push it into the scan when `df` is a raw source."""
    failures = df.filter(violation_for(rule))
    return make_failure_log(
        failures, rule.check_code, rule.eval_code, rule.description,
        value_col=rule.column, **log_kw,
    )


def battery_coverage(df: DataFrame, rules: list[Rule]) -> tuple[list[Rule], list[Rule]]:
    """Split rules into (applicable, skipped) for this DataFrame's columns —
    the audit surface for column-absence exclusions (VERDICT r2 #5). A real
    run logs the skipped check codes to the metrics table so a typo'd rule
    column is visible, never silently dropped."""
    cols = set(df.columns)
    applicable = [r for r in rules if all(c in cols for c in r.required_columns())]
    skipped = [r for r in rules if any(c not in cols for c in r.required_columns())]
    return applicable, skipped


def run_battery(
    df: DataFrame,
    rules: list[Rule],
    url_col: str = "url",
    doc_id_col: str = "doc_id",
    source_col: str = "source",
    strict: bool = False,
) -> DataFrame:
    """ONE-PASS battery: evaluate every rule as a boolean column, then
    explode failing flags into the long failure log.

    Equivalent to unioning `check_rule` over rules (the reference's
    bind_rows loop) but reads the input exactly once: the wide projection
    computes all flags inside a single whole-stage-codegen pipeline and an
    `explode` of a compact struct array yields the long form. No shuffle,
    no repeated scan.

    Rules whose columns are absent are SKIPPED, and the skip is surfaced:
    a warning names every excluded check code and its missing columns
    (the reference's evaluate_periodicity.default warn, R/evaluate_
    periodicity.R:37-43); `strict=True` raises instead — use it when the
    rule set is supposed to match the schema exactly, so a typo'd column
    fails the run rather than quietly dropping a check (VERDICT r2 #5).
    """
    cols = set(df.columns)
    present, skipped = battery_coverage(df, rules)
    if skipped:
        detail = ", ".join(
            f"{r.check_code} (missing: "
            + ", ".join(sorted(set(r.required_columns()) - cols))
            + ")"
            for r in skipped
        )
        if strict:
            raise ValueError(f"rules reference absent columns: {detail}")
        import warnings

        warnings.warn(f"run_battery skipped rules: {detail}", stacklevel=2)

    flag_structs = [
        F.when(
            violation_for(r),
            F.struct(
                F.lit(r.check_code).alias("check_code"),
                F.col(r.column).cast("string").alias("value"),
                F.lit(r.eval_code).alias("eval_code"),
                F.lit(r.description).alias("description"),
            ),
        )
        for r in present
    ]
    if not flag_structs:
        raise ValueError("no applicable rules for this DataFrame")

    def key(name: str, cast: str):
        return (F.col(name).cast(cast) if name in cols else F.lit(None).cast(cast))

    exploded = df.select(
        key(source_col, "string").alias("source"),
        key(url_col, "string").alias("url"),
        key(doc_id_col, "long").alias("doc_id"),
        F.explode(
            F.filter(F.array(*flag_structs), lambda x: x.isNotNull())
        ).alias("f"),
    )
    return exploded.select(
        "source", "url", "doc_id",
        F.col("f.check_code").alias("check_code"),
        F.col("f.value").alias("value"),
        F.col("f.eval_code").alias("eval_code"),
        F.col("f.description").alias("description"),
    )
