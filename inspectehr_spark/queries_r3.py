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


R3_QUERIES = {
    "periodicity_failures": (q_periodicity_failures, SQL_PERIODICITY_FAILURES),
    "near_dup_cells": (q_near_dup_cells, SQL_NEAR_DUP_CELLS),
}
