"""As-of join: for each left row, the latest right row at-or-before its
timestamp (backward), the earliest at-or-after (forward), or the closer
of the two (nearest), per key — the operator Spark's DataFrame API lacks
natively (pandas merge_asof / DuckDB ASOF JOIN / kdb aj equivalent).

Implementation is the UNION + CARRY-FORWARD formulation, not a join:
tag both sides, union them, and run ONE window per key ordered by
(ts, side) that carries the last right-side payload forward; left rows
then read their as-of match from the carried columns. The forward
direction is the same window scanned descending; nearest evaluates both
over the SAME exchange (two Sort nodes, one hash partitioning — Spark
reuses the exchange for sibling windows on the same key). Compared to the
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
    direction: str = "backward",
) -> DataFrame:
    """As-of join in the given `direction` ("backward", "forward",
    "nearest").

    Returns `left` plus, for each row, `asof_<c>` for each payload column
    of the matched right row (NULL when none) and `asof_ts` (the matched
    timestamp). Backward matches the greatest `right_ts` <= `left_ts` per
    `key`; forward the least `right_ts` >= `left_ts`; nearest whichever
    of the two is closer in time (ties go backward). With
    `tolerance_sec`, matches farther than the tolerance are nulled out —
    AFTER the carry, so it is a projection, not a different scan; for
    nearest it is applied per side BEFORE choosing the closer one.

    Determinism: when several right rows share the matching timestamp the
    survivor is the last under the window's (right_ts, *payload) ordering
    — collapse the right side to one row per (key, ts) first if another
    tiebreak is wanted. Left rows tie-break AFTER right rows at the same
    timestamp in both directions, which is what makes the match
    inclusive.

    NULL-timestamp contract (matches DuckDB ASOF / pandas merge_asof):
    right rows with NULL `right_ts` are dropped before the union (a NULL
    can never satisfy the inequality, and left in place it would sort
    first in the ascending scan and leak its payload into every carry);
    left rows with NULL `left_ts` are kept but never match (asof_* all
    NULL)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    right = right.filter(F.col(right_ts).isNotNull())
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
    unioned = l.unionByName(r)

    def carried_cols(dir_: str, suffix: str):
        # Backward scans ascending; forward scans descending. In both, a
        # right row at the same _ts as a left row sorts BEFORE it
        # (side 0 < 1 ascending; descending negates the side too, so flip
        # its sign) — inclusive match either way.
        if dir_ == "backward":
            order = [F.col("_ts").asc(), F.col("_side").asc()] + [
                F.col(f"_p_{c}").asc() for c in payload
            ]
        else:
            order = [F.col("_ts").desc(), F.col("_side").asc()] + [
                F.col(f"_p_{c}").asc() for c in payload
            ]
        w = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return [
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_{suffix}_{c}")
            for c in payload
        ] + [F.last("_p_ts", ignorenulls=True).over(w).alias(f"_{suffix}_ts")]

    dirs = ("b", "f") if direction == "nearest" else (
        ("b",) if direction == "backward" else ("f",)
    )
    carried = unioned.select(
        "_side",
        "_l",
        *[
            c
            for s in dirs
            for c in carried_cols("backward" if s == "b" else "forward", s)
        ],
    ).filter(F.col("_side") == 1)

    def gap_us(suffix: str):
        g = F.unix_micros(F.col(f"_{suffix}_ts").cast("timestamp")) - F.unix_micros(
            F.col("_l")[left_ts].cast("timestamp")
        )
        return F.abs(g)

    def within(suffix: str):
        # coalesce to FALSE: an unmatched side carries NULL, and a NULL
        # tolerance comparison would poison the nearest-side three-valued
        # logic (NULL & x, ~NULL) into selecting neither side
        # a left row with NULL left_ts never matches: in the descending
        # (forward) scan NULLs sort last and would otherwise spuriously
        # carry the earliest right row
        has_left_ts = F.col("_l")[left_ts].isNotNull()
        if tolerance_sec is None:
            return has_left_ts & F.col(f"_{suffix}_ts").isNotNull()
        return F.coalesce(
            has_left_ts
            & F.col(f"_{suffix}_ts").isNotNull()
            & (gap_us(suffix) <= tolerance_sec * 1e6),
            F.lit(False),
        )

    if direction != "nearest":
        s = dirs[0]
        ok = within(s)
        return carried.select(
            *[F.col("_l")[c].alias(c) for c in lcols],
            *[F.when(ok, F.col(f"_{s}_{c}")).alias(f"asof_{c}") for c in payload],
            F.when(ok, F.col(f"_{s}_ts")).alias("asof_ts"),
        )

    b_ok, f_ok = within("b"), within("f")
    # prefer backward on ties; a side out of tolerance (or unmatched) loses
    use_b = b_ok & (~f_ok | (gap_us("b") <= gap_us("f")))
    use_f = f_ok & ~use_b
    return carried.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[
            F.when(use_b, F.col(f"_b_{c}"))
            .when(use_f, F.col(f"_f_{c}"))
            .alias(f"asof_{c}")
            for c in payload
        ],
        F.when(use_b, F.col("_b_ts")).when(use_f, F.col("_f_ts")).alias("asof_ts"),
    )
