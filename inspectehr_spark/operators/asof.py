"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key — the operator Spark's DataFrame API lacks natively
(pandas merge_asof / DuckDB ASOF JOIN / kdb aj equivalent).

Implementation is the UNION + CARRY-FORWARD formulation, not a join:
tag both sides, union them, and run ONE window per key ordered by
(ts, side) that carries the last right-side payload forward; left rows
then read their as-of match from the carried columns. Compared to the
range-join formulation (equi-join on key + ts inequality + row_number),
this shuffles each input row exactly once, never materializes the
O(left × right-per-key) candidate set, and needs no range-bucketing
tuning — the single sort on (key, ts) is the whole cost, and it is the
plan you'd want at 10^12 rows (the window sort is Spark's spillable
external sort; skewed keys salt the same way any window does).

Reference analog: none (inspectEHR has no temporal join); this is part of
the beyond-reference training-data operator set (SURVEY §8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join.

    Returns `left` plus, for each row, `asof_<c>` for each payload column
    of the right row having the greatest `right_ts` <= `left_ts` for the
    same `key` (NULL when none), and `asof_ts` (the matched timestamp). With
    `tolerance_sec`, matches older than the tolerance are nulled out —
    AFTER the carry-forward, so it is a projection, not a different scan.

    Determinism: when several right rows share the matching timestamp the
    survivor is the last under (right_ts, *payload) ordering — collapse
    the right side to one row per (key, ts) first if another tiebreak is
    wanted. Left rows tie-break AFTER right rows at the same timestamp
    (side ordering right=0 < left=1), which is what makes the join
    inclusive."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_p_ts"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(right_ts).alias("_p_ts"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", *[f"_p_{c}" for c in payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "_side",
        "_l",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload
        ],
        F.last("_p_ts", ignorenulls=True).over(w).alias("_c_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    within = (
        F.lit(True)
        if tolerance_sec is None
        else (
            F.unix_micros(F.col("_l")[left_ts].cast("timestamp"))
            - F.unix_micros(F.col("_c_ts").cast("timestamp"))
        )
        <= tolerance_sec * 1e6
    )
    return out.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.when(within, F.col(f"_c_{c}")).alias(f"asof_{c}") for c in payload],
        F.when(within, F.col("_c_ts")).alias("asof_ts"),
    )
