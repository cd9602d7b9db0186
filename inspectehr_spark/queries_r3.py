"""Registry batch 4 (round 3): per-event periodicity decomposition and the
near-dup cell-cap metrics table — each the operator's own output with a
DuckDB value oracle, landed in the same commit as the operator (VERDICT r2
#3's rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectehr_spark.tables import table as _t

# cadence spec for the events table: [2, 48] events per 24h — wide enough
# that most events pass, tight enough that the fixture plants both sparse
# (overnight gaps) and dense (sub-half-hour bursts) failures naturally.
PERIOD_LO, PERIOD_HI = 2.0, 48.0


def q_periodicity_failures(spark, sf_dir):
    """Per-EVENT periodicity failures (reference
    R/evaluate_periodicity.R:48-94 via operators/windows.periodicity_failures):
    an event fails when its user has <2 events or the gap to the next event
    implies a rate outside [2, 48]/day. Event-granular — the decomposition
    of the per-entity `periodicity` verdict (VERDICT r2 #4)."""
    from inspectehr_spark.operators.windows import periodicity_failures

    ev = _t(spark, sf_dir, "events")
    return periodicity_failures(
        ev, "user_id", "ts", PERIOD_LO, PERIOD_HI, id_col="event_id"
    ).select("event_id", "user_id", "eval_code")


SQL_PERIODICITY_FAILURES = f"""
WITH g AS (
  SELECT event_id, user_id,
         count(*) OVER (PARTITION BY user_id) AS n,
         (epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
          - epoch_us(ts)) / 3.6e9 AS gap
  FROM events
)
SELECT event_id, user_id, 'VE_TP_05' AS eval_code
FROM g
WHERE n < 2
   OR (gap IS NOT NULL AND (gap > 24.0/{PERIOD_LO} OR gap < 24.0/{PERIOD_HI}))
"""


def q_near_dup_cells(spark, sf_dir):
    """The near-dup cap's metrics table (ann.near_dup_cell_stats): per-cell
    vector count, kept count under the cap, and dropped count — the
    never-silent companion of embedding_near_dup's bucket_cap (VERDICT r2
    #2). Cap 30 binds at every sf so the least/dropped arithmetic itself is
    value-checked."""
    from inspectehr_spark.ann import near_dup_cell_stats

    emb = _t(spark, sf_dir, "embeddings")
    return near_dup_cell_stats(emb, bucket_col="label", bucket_cap=30).select(
        "bucket",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
    )


SQL_NEAR_DUP_CELLS = """
SELECT label AS bucket,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(least(count(*), 30) AS BIGINT) AS n_kept,
       CAST(count(*) - least(count(*), 30) AS BIGINT) AS n_dropped
FROM embeddings GROUP BY label
"""


def q_asof_last_view(spark, sf_dir):
    """As-of join (operators/asof.py — union + carry-forward, ONE shuffle,
    no join node): every purchase event annotated with the latest view
    event of the same user at-or-before it. The right side collapses to
    one row per (user, ts) first (max event_id) so the match is engine-
    independent under timestamp ties."""
    from inspectehr_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        payload=["view_event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_view_event_id").alias("view_event_id"),
        F.col("asof_ts").alias("view_ts"),
    )


SQL_ASOF_LAST_VIEW = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.ts AS view_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_daily_type_rollup(spark, sf_dir):
    """Multi-resolution rollup (the hypertable-rollup analog): event counts
    at (event_type, day), (event_type) and grand-total grain in ONE pass —
    Spark's rollup compiles to a single Expand + aggregate, i.e. one scan
    and one shuffle for all three resolutions instead of three jobs."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("event_type", F.col("day").cast("string").alias("day"), "n_events")
    )


SQL_DAILY_TYPE_ROLLUP = """
SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
"""


def q_value_percentiles(spark, sf_dir):
    """EXACT distributed percentiles per group (Spark's sort-based
    `percentile` aggregate — R-7 linear interpolation, the same definition
    as DuckDB quantile_cont), not approx_percentile: the value oracle
    hash-matches, which a sketch never could. Scale note: exact percentile
    shuffles (group, value) pairs and sorts within group — use it per
    bounded group; corpus-wide quantiles at 10^12 rows take
    approx_percentile + an error budget instead."""
    ev = _t(spark, sf_dir, "events")
    pct = [0.25, 0.5, 0.75, 0.9]
    out = ev.groupBy("event_type").agg(
        F.percentile("value", pct).alias("_q")
    )
    return out.select(
        "event_type",
        *[F.round(F.col("_q")[i], 6).alias(f"p{int(p * 100)}") for i, p in enumerate(pct)],
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type,
       ROUND(quantile_cont("value", 0.25), 6) AS p25,
       ROUND(quantile_cont("value", 0.50), 6) AS p50,
       ROUND(quantile_cont("value", 0.75), 6) AS p75,
       ROUND(quantile_cont("value", 0.90), 6) AS p90
FROM events GROUP BY event_type
"""


R3_QUERIES = {
    "periodicity_failures": (q_periodicity_failures, SQL_PERIODICITY_FAILURES),
    "near_dup_cells": (q_near_dup_cells, SQL_NEAR_DUP_CELLS),
    "asof_last_view": (q_asof_last_view, SQL_ASOF_LAST_VIEW),
    "daily_type_rollup": (q_daily_type_rollup, SQL_DAILY_TYPE_ROLLUP),
    "value_percentiles": (q_value_percentiles, SQL_VALUE_PERCENTILES),
}
