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


def q_asof_next_view(spark, sf_dir):
    """FORWARD as-of join (asof.asof_join(direction="forward") — the
    descending-scan mirror of the backward carry, same single exchange):
    every purchase annotated with the EARLIEST view at-or-after it."""
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
        payload=["view_event_id"], direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_view_event_id").alias("view_event_id"),
        F.col("asof_ts").alias("view_ts"),
    )


SQL_ASOF_NEXT_VIEW = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.ts AS view_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
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


def q_word_dup_stats(spark, sf_dir):
    """Gopher duplicate-segment mass (operators/webrules.segment_dup_stats)
    at word granularity over the single-line documents fixture (sep=" " —
    the same operator serves sep="\\n" on real web pages): per-doc segment
    counts, duplicate-slot fraction, and duplicate-character mass, computed
    ZERO-shuffle by adjacent comparison over the sorted segment array."""
    from inspectehr_spark.operators.webrules import segment_dup_stats
    from inspectehr_spark.tables import parallel_scan

    # r7: scan parallelized — the sort+adjacent-compare per-row pass
    # otherwise runs on the single scan core
    docs = parallel_scan(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return segment_dup_stats(docs, "text", sep=" ", prefix="seg").select(
        "doc_id", "seg_total", "seg_distinct", "seg_dup_frac", "seg_dup_char_frac"
    )


SQL_WORD_DUP_STATS = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per AS (
  SELECT doc_id, w, count(*) AS c, length(w) AS l FROM w GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS seg_total,
       CAST(count(*) AS BIGINT) AS seg_distinct,
       ROUND(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS seg_dup_frac,
       CASE WHEN sum(c * l) > 0
            THEN ROUND(sum(CASE WHEN c > 1 THEN c * l ELSE 0 END)
                       / CAST(sum(c * l) AS DOUBLE), 6)
            ELSE 0.0 END AS seg_dup_char_frac
FROM per GROUP BY doc_id
"""


def q_line_scrub(spark, sf_dir):
    """C4-style line scrub (operators/webrules.line_scrub): lines derived
    deterministically from the fixture by breaking on ' the ' (both
    engines; the operator itself is sep-generic), keep lines of >= 4
    whitespace words, rebuild the doc. Pure zero-shuffle projection."""
    from inspectehr_spark.operators.webrules import line_scrub

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace("text", " the ", "\n").alias("text")
    )
    return line_scrub(docs, "text", sep="\n", min_words=4).select(
        "doc_id", "lines_total", "lines_kept", "scrubbed"
    )


SQL_LINE_SCRUB = """
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(text, ' the ', chr(10), 'g'), chr(10)) AS segs
  FROM documents
),
k AS (
  SELECT doc_id, segs,
         list_filter(segs, x -> len(string_split(x, ' ')) >= 4) AS kept
  FROM d
)
SELECT doc_id,
       CAST(len(segs) AS BIGINT) AS lines_total,
       CAST(len(kept) AS BIGINT) AS lines_kept,
       array_to_string(kept, chr(10)) AS scrubbed
FROM k
"""


def q_dedup_within_doc(spark, sf_dir):
    """Segment-level dedup + rebuild (operators/webrules.dedup_segments,
    scope="doc"): every word keeps only its first occurrence per document
    and the text is rebuilt in original order — the RefinedWeb paragraph-
    dedup shape, value-checked end-to-end including the rebuilt string."""
    from inspectehr_spark.operators.webrules import dedup_segments

    docs = _t(spark, sf_dir, "documents")
    return dedup_segments(
        docs, "doc_id", "text", sep=" ", scope="doc"
    ).select("doc_id", "lines_total", "lines_kept", "text_deduped")


SQL_DEDUP_WITHIN_DOC = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS seg,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
r AS (
  SELECT doc_id, seg, pos,
         row_number() OVER (PARTITION BY doc_id, seg ORDER BY pos) AS rn
  FROM w
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS lines_total,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS lines_kept,
       string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos) AS text_deduped
FROM r GROUP BY doc_id
"""


def q_psi_drift(spark, sf_dir):
    """Population Stability Index of every event_type's value distribution
    against the 'view' reference (operators/distribution.psi_by_group):
    fixed-width global bins (engine-independent, unlike quantile bins),
    ε-smoothed, one shuffle of G×bins rows."""
    from inspectehr_spark.operators.distribution import psi_by_group

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return psi_by_group(ev, "event_type", "value", ref_group="view", n_bins=10)


SQL_PSI_DRIFT = """
WITH src AS (
  SELECT event_type, CAST("value" AS DOUBLE) AS v FROM events
  WHERE "value" IS NOT NULL
),
rng AS (SELECT min(v) AS lo, max(v) AS hi FROM src),
b AS (
  SELECT event_type AS g,
         CAST(CASE WHEN hi > lo
              THEN least(greatest(floor((v - lo) / ((hi - lo) / 10)), 0), 9)
              ELSE 0 END AS BIGINT) AS bin
  FROM src, rng
),
dist AS (SELECT g, bin, count(*) AS c FROM b GROUP BY g, bin),
tot AS (SELECT g, sum(c) AS t FROM dist GROUP BY g),
p AS (SELECT dist.g, bin, c / CAST(t AS DOUBLE) AS p FROM dist JOIN tot ON dist.g = tot.g),
grid AS (
  SELECT gs.g, r.range AS bin
  FROM (SELECT DISTINCT g FROM p) gs, range(10) r
),
full_grid AS (
  SELECT grid.g,
         COALESCE(mine.p, 0) + 1e-6 AS pp,
         COALESCE(ref.p, 0) + 1e-6 AS qq
  FROM grid
  LEFT JOIN p mine ON mine.g = grid.g AND mine.bin = grid.bin
  LEFT JOIN p ref ON ref.g = 'view' AND ref.bin = grid.bin
)
SELECT g AS event_type, ROUND(sum((pp - qq) * ln(pp / qq)), 6) AS psi
FROM full_grid GROUP BY g
"""


def q_near_dup_components(spark, sf_dir):
    """Duplicate CLUSTERS from the embedding near-dup pair set
    (operators/graph.connected_components — iterative min-label
    propagation, each round pure DataFrame algebra): component = smallest
    reachable vec_id, value-checked against a DuckDB recursive CTE over
    the SAME pair set. Pairs come from the arrow GEMM engine — only pair
    IDENTITY feeds the graph (no cosine values in the output), and the
    sql/arrow engines emit identical pair sets (unit-asserted, and
    re-verified at sf0.001/0.01/0.1/staged-sf1); at sf1 the sql HOF
    cosine costs 58 s vs arrow's 4.5 s for the same 122k pairs."""
    from inspectehr_spark.ann import embedding_near_dup_pairs
    from inspectehr_spark.operators.graph import connected_components

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(
        emb, threshold=0.35, bucket_col="label", bucket_cap=2000,
        engine="arrow",
    )
    return connected_components(pairs, src="vec_id_a", dst="vec_id_b").select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


SQL_NEAR_DUP_COMPONENTS = """
WITH RECURSIVE capped AS (
  SELECT vec_id, label, embedding FROM (
    SELECT vec_id, label, embedding,
           ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM embeddings
  ) WHERE rn <= 2000
),
e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
  FROM capped
),
pairs AS (
  SELECT vec_id_a, vec_id_b FROM (
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  ) WHERE cos_sim >= 0.35
),
edges AS (
  SELECT vec_id_a AS a, vec_id_b AS b FROM pairs
  UNION
  SELECT vec_id_b, vec_id_a FROM pairs
),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.n, e2.b FROM reach r JOIN edges e2 ON r.m = e2.a
)
SELECT CAST(n AS BIGINT) AS node, CAST(min(m) AS BIGINT) AS component
FROM reach GROUP BY n
"""


R3_QUERIES = {
    "periodicity_failures": (q_periodicity_failures, SQL_PERIODICITY_FAILURES),
    "near_dup_cells": (q_near_dup_cells, SQL_NEAR_DUP_CELLS),
    "asof_last_view": (q_asof_last_view, SQL_ASOF_LAST_VIEW),
    "asof_next_view": (q_asof_next_view, SQL_ASOF_NEXT_VIEW),
    "daily_type_rollup": (q_daily_type_rollup, SQL_DAILY_TYPE_ROLLUP),
    "value_percentiles": (q_value_percentiles, SQL_VALUE_PERCENTILES),
    "word_dup_stats": (q_word_dup_stats, SQL_WORD_DUP_STATS),
    "line_scrub": (q_line_scrub, SQL_LINE_SCRUB),
    "dedup_within_doc": (q_dedup_within_doc, SQL_DEDUP_WITHIN_DOC),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "near_dup_components": (q_near_dup_components, SQL_NEAR_DUP_COMPONENTS),
}
