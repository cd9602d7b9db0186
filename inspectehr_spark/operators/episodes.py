"""Episode-level composites: characterise_episodes, evaluate_origin,
evaluate_episodes (the month blacklist).

Reference: R/characterise_episodes.R:30-191 (its largest function),
R/evaluate_origin.R:12-20, R/verify_episodes.R:26-150. The reference builds
an episode table from a wide pivot, derives the episode end by an
outcome-precedence case_when, runs 7 validity checks collecting an
`invalid_records` side table (an R attribute), anti-joins it away and
computes LOS; events of invalid episodes then inherit failure
(evaluate_origin); finally site-months with too many bad days blacklist
all their episodes (evaluate_episodes).

Spark shape: all patient-keyed logic (conflicting deaths, duplicate
start/end, overlap) is window functions sharing ONE shuffle — the first
window partitions by the entity alone and the later (entity, ts) windows
are satisfied by the same hash partitioning (hashpartitioning(entity)
clusters every (entity, x) requirement), so the chain plans a single
Exchange. Check flags are evaluated as columns in one pass and exploded to
the long invalid-records form (no bind_rows loop, no repeated scans). The
invalid_records "attribute" becomes the second element of a returned
tuple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INVALID_RECORDS_COLS = ["episode_id", "code", "reason"]


def characterise_episodes(
    wide: DataFrame,
    *,
    episode_col: str = "episode_id",
    entity_col: str = "nhs",
    start_col: str = "epi_start_dttm",
    src_end_col: str = "src_end_dttm",
    death_col: str = "death_dttm",
    bsd_dttm_col: str = "bsd_dttm",
    bsd_flag_col: str = "bsd",
    outcome_col: str = "outcome",
    id_valid_col: str = "nhs_valid",
) -> tuple[DataFrame, DataFrame]:
    """Build the episode (LOS) table and its invalid-records side table.

    Input is the WIDE per-episode frame (one row per episode: identity,
    start, end candidates, outcome, precomputed identity-validity flag —
    the output of a demographics pivot, reference
    R/characterise_episodes.R:231-245 / operators/extract.py pivot).

    Semantics mirror R/characterise_episodes.R:30-191:

    1. epi_end_dttm by outcome precedence (:88-100): alive → source end;
       died without brainstem-death declaration → death dttm; died with
       declaration → brainstem-death dttm; anything else unresolvable.
    2. Seven checks, each contributing (episode_id, code, reason) rows:
       invalid identity VA_VC_01, no outcome VA_CP_01, conflicting death
       times per patient VE_UP_01 (flags ALL episodes of the patient,
       :74-86), unreconcilable end VE_CP_01, LOS <= 0 VE_TP_01, duplicate
       start / duplicate end per patient VE_UP_01 (keep-first by
       episode_id; the reference's distinct-then-anti-join at :121-142 as
       written always yields zero rows — we implement the documented
       intent with row_number, NULL ends excluded since they are already
       VE_CP_01), overlapping episodes VE_VC_04 (:145-164, strict
       next_start < end ordered by (start, episode_id) — the explicit
       tiebreak makes the verdict deterministic under parallelism).
    3. episode_table = rows with NO check firing → (episode_id, nhs_number,
       epi_start_dttm, epi_end_dttm, outcome, los_days) (:167-190). The
       reference anti-joins invalid_records back; since every check is a
       column here, "absent from the failure set" is a plain filter — the
       anti-join (and a second scan of the input) disappears.

    Returns (episode_table, invalid_records).
    """
    o = F.col(outcome_col)
    src = F.col(src_end_col)
    death = F.col(death_col)
    bsd_flag = F.col(bsd_flag_col)
    bsd_dttm = F.col(bsd_dttm_col)

    end = (
        F.when((o == "A") & src.isNull(), F.lit(None).cast("timestamp"))
        .when(o == "A", src)
        .when(
            (o == "D") & death.isNotNull()
            & (F.coalesce(bsd_flag, F.lit(0)) == 0),
            death,
        )
        .when((o == "D") & (bsd_flag == 1) & bsd_dttm.isNotNull(), bsd_dttm)
        .otherwise(F.lit(None).cast("timestamp"))
    )
    df = wide.withColumn("epi_end_dttm", end)

    # entity-keyed windows — (entity) first so hashpartitioning(entity)
    # satisfies every later (entity, ts) clustering requirement: 1 shuffle
    w_entity = Window.partitionBy(entity_col)
    w_order = Window.partitionBy(entity_col).orderBy(
        F.col(start_col), F.col(episode_col)
    )
    w_start = Window.partitionBy(entity_col, start_col).orderBy(episode_col)
    w_end = Window.partitionBy(entity_col, "epi_end_dttm").orderBy(episode_col)
    df = (
        df.withColumn(
            "_death_conflict", F.size(F.collect_set(death_col).over(w_entity)) > 1
        )
        .withColumn("_next_start", F.lead(start_col).over(w_order))
        .withColumn("_rn_start", F.row_number().over(w_start))
        .withColumn("_rn_end", F.row_number().over(w_end))
    )

    end_c = F.col("epi_end_dttm")
    checks = [
        (~F.col(id_valid_col), "VA_VC_01", "invalid nhs number"),
        ((o == "E") | o.isNull(), "VA_CP_01", "no ICU outcome status"),
        (F.col("_death_conflict"), "VE_UP_01",
         "duplicate and conflicting death times"),
        (end_c.isNull(), "VE_CP_01", "episode end cannot be reconciled"),
        (end_c <= F.col(start_col), "VE_TP_01", "episode length <= 0"),
        (F.col("_rn_start") > 1, "VE_UP_01", "duplicate start time of episode"),
        (end_c.isNotNull() & (F.col("_rn_end") > 1), "VE_UP_01",
         "duplicate end time of episode"),
        (F.col("_next_start").isNotNull() & (F.col("_next_start") < end_c),
         "VE_VC_04", "overlapping episodes"),
    ]
    flag_structs = [
        F.when(
            cond,
            F.struct(F.lit(code).alias("code"), F.lit(reason).alias("reason")),
        )
        for cond, code, reason in checks
    ]
    invalid_records = df.select(
        F.col(episode_col).alias("episode_id"),
        F.explode(
            F.filter(F.array(*flag_structs), lambda x: x.isNotNull())
        ).alias("f"),
    ).select("episode_id", F.col("f.code").alias("code"),
             F.col("f.reason").alias("reason"))

    los = (
        (F.unix_micros(end_c.cast("timestamp"))
         - F.unix_micros(F.col(start_col).cast("timestamp")))
        / 3.6e9 / 24.0
    )
    # NULL check verdicts mean "no failure" for keep purposes
    any_flag = F.lit(False)
    for cond, _code, _reason in checks:
        any_flag = any_flag | F.coalesce(cond, F.lit(False))
    episode_table = df.filter(~any_flag).select(
        F.col(episode_col).alias("episode_id"),
        F.col(entity_col).alias("nhs_number"),
        F.col(start_col).alias("epi_start_dttm"),
        end_c.alias("epi_end_dttm"),
        o.alias("outcome"),
        F.round(los, 6).alias("los_days"),
    )
    return episode_table, invalid_records


def evaluate_origin(
    events: DataFrame,
    invalid_records: DataFrame,
    key: str = "episode_id",
    eval_code: str = "VE_RC_04",
    description: str = "Event originates in episode failing quality evaluation",
) -> DataFrame:
    """Failure rows for every event of an invalid episode — the mechanism
    by which episode-level failures cascade to events
    (reference R/evaluate_origin.R:12-20: distinct invalid ids INNER JOIN
    events; inner not leftsemi because the event rows are the output).

    The invalid id set is dimension-sized relative to events → broadcast.
    """
    invalid = invalid_records.select(key).distinct()
    return events.join(F.broadcast(invalid), key, "inner").withColumns(
        {
            "eval_code": F.lit(eval_code),
            "description": F.lit(description),
        }
    )


def evaluate_episodes(
    episode_table: DataFrame,
    *,
    site_col: str = "site",
    start_col: str = "epi_start_dttm",
    episode_col: str = "episode_id",
    threshold: int = 10,
    sd_k: float = 2.0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Month-level blacklist (reference R/verify_episodes.R:26-150):

    1. daily admissions per (site, date); baseline mean/sd per
       (site, year, weekday) of the DISTINCT-episode daily counts (:33-46);
    2. too-few days: daily row count < mean - sd_k*sd (:49-68; the
       reference multiplier is 2 — the sd_k default; sd is the
       sample sd — NULL with a single observation, and NULL comparisons
       yield no verdict, matching R's NA semantics);
    3. absent days: the per-site calendar (global min..max date × sites,
       :78-106) minus days with any admission;
    4. months with >= threshold bad days (too-few ∪ absent) per site
       blacklist every episode starting in them (VE_CP_03, :110-141).

    Returns (valid_episode_table, invalid_records, invalid_months). All
    aggregates are (site × day)-sized; the blacklist join back to episodes
    is a broadcast.
    """
    site = F.col(site_col)
    d = F.to_date(start_col)
    daily = episode_table.groupBy(site.alias("site"), d.alias("date")).agg(
        F.countDistinct(episode_col).alias("episode_count"),
        F.count(F.lit(1)).alias("episodes"),
    )
    baseline = daily.groupBy(
        "site",
        F.year("date").alias("year"),
        F.dayofweek("date").alias("wday"),
    ).agg(
        F.avg("episode_count").alias("mean_episodes"),
        F.stddev_samp("episode_count").alias("sd_episodes"),
    )
    too_few = (
        daily.withColumn("year", F.year("date"))
        .withColumn("wday", F.dayofweek("date"))
        .join(baseline, ["site", "year", "wday"], "left")
        .filter(
            F.col("episodes")
            < (F.col("mean_episodes") - sd_k * F.col("sd_episodes"))
        )
        .select("site", "date")
    )

    span = episode_table.select(
        F.min(d).alias("lo"), F.max(d).alias("hi")
    )
    calendar = (
        span.select(F.explode(F.sequence("lo", "hi")).alias("date"))
        .crossJoin(episode_table.select(site.alias("site")).distinct())
    )
    absent = calendar.join(
        daily.select("site", "date"), ["site", "date"], "left_anti"
    )

    invalid_months = (
        too_few.unionByName(absent)
        .groupBy(
            "site",
            F.year("date").alias("year"),
            F.month("date").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("n_bad_days"))
        .filter(F.col("n_bad_days") >= threshold)
    )

    keyed = episode_table.withColumn("_year", F.year(d)).withColumn(
        "_month", F.month(d)
    )
    bl = F.broadcast(
        invalid_months.select(
            "site", F.col("year").alias("_year"), F.col("month").alias("_month")
        )
    )
    join_keys = [site_col, "_year", "_month"] if site_col == "site" else None
    if join_keys is None:
        bl = bl.withColumnRenamed("site", site_col)
        join_keys = [site_col, "_year", "_month"]
    invalid_records = (
        keyed.join(bl, join_keys, "leftsemi")
        .select(
            F.col(episode_col).alias("episode_id"),
            F.lit("VE_CP_03").alias("code"),
            F.lit("episode originates in bad sector").alias("reason"),
        )
    )
    valid = keyed.join(bl, join_keys, "left_anti").drop("_year", "_month")
    return valid, invalid_records, invalid_months
