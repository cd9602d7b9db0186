"""Missingness checks: global (group × category grid) and local (calendar
gaps in contribution).

Reference: R/evaluate_missingness.R — expand_grid(site, code) minus
contributed pairs (global, :15-57) and per-site-month calendar full join
with NULL-count detection (local, :128-214). Spark: crossJoin of two tiny
distinct sets (both dimension-sized → broadcast) + left_anti; calendar via
explode(sequence()) — never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_missingness(
    df: DataFrame,
    group_col: str,
    category_col: str,
    universe_categories: DataFrame | None = None,
) -> DataFrame:
    """(group, category) pairs in the expected grid with zero contribution.

    The grid is distinct(groups) × distinct(categories) — both sides tiny
    relative to the fact table, so the crossJoin is dimension-side only and
    the anti-join's right side is an aggregate, not the raw facts.
    """
    groups = df.select(group_col).distinct()
    cats = (
        universe_categories
        if universe_categories is not None
        else df.select(category_col).distinct()
    )
    grid = groups.crossJoin(F.broadcast(cats))
    observed = df.select(group_col, category_col).distinct()
    return grid.join(observed, [group_col, category_col], "left_anti")


def month_calendar(df: DataFrame, ts_col: str, group_col: str | None = None) -> DataFrame:
    """Per-group (or global) sequence of month-start dates spanning
    [min(ts), max(ts)] — explode(sequence(...)), reference calendar
    expansion R/utils.R:318-342."""
    keys = [group_col] if group_col else []
    bounds = df.groupBy(*keys).agg(
        F.date_trunc("month", F.min(ts_col)).alias("_lo"),
        F.date_trunc("month", F.max(ts_col)).alias("_hi"),
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_lo").cast("date"),
                F.col("_hi").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start"),
    )


def local_missingness(
    df: DataFrame,
    group_col: str,
    ts_col: str,
) -> DataFrame:
    """(group, month) cells inside each group's own activity span with zero
    events. Reference: evaluate_local_missingness 1d/2d
    (R/evaluate_missingness.R:128-214).

    Aggregate first (tiny), then join calendar — the fact table is touched
    once by a partial-agg groupBy; the calendar join is dimension-sized.
    """
    monthly = df.groupBy(
        group_col, F.date_trunc("month", F.col(ts_col)).cast("date").alias("month_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))

    cal = month_calendar(df, ts_col, group_col)
    return (
        cal.join(monthly, [group_col, "month_start"], "left")
        .filter(F.col("n_events").isNull())
        .select(group_col, "month_start")
    )
