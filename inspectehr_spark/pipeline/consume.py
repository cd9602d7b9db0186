"""Consumer API — the study_safely analog (reference R/study_safely.R:41-96):
"give me clean data" = kept docs ∩ healthy partitions, all anti-joins over
the persisted quality metadata, no recomputation of checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_blacklist(
    metrics: DataFrame, min_pass_rate: float = 0.5
) -> DataFrame:
    """Partitions whose worst-check pass rate falls below the floor
    (reference site-month blacklist, R/verify_episodes.R:26-150)."""
    rates = metrics.withColumn(
        "pass_rate",
        F.when(
            F.col("n_checked") > 0,
            1.0 - F.col("n_failed") / F.col("n_checked"),
        ),
    )
    return (
        rates.groupBy("partition_id")
        .agg(F.min("pass_rate").alias("worst_pass_rate"))
        .filter(F.col("worst_pass_rate") < min_pass_rate)
        .select("partition_id")
    )


def study_safely(
    spark: SparkSession,
    out_dir: str,
    from_date: str | None = None,
    to_date: str | None = None,
    min_pass_rate: float = 0.5,
) -> DataFrame:
    """Kept documents within [from_date, to_date], excluding blacklisted
    partitions — pure reads + filters + one broadcast anti-join. Reads the
    latest committed snapshot of each sink (run.read_sink)."""
    from inspectehr_spark.pipeline.run import read_sink

    decisions = read_sink(spark, out_dir, "decisions")
    metrics = read_sink(spark, out_dir, "metrics")
    out = decisions.filter(F.col("keep"))
    if from_date:
        out = out.filter(F.col("p_date") >= F.lit(from_date).cast("date"))
    if to_date:
        out = out.filter(F.col("p_date") <= F.lit(to_date).cast("date"))
    bl = partition_blacklist(metrics, min_pass_rate).select(
        F.col("partition_id").cast("date").alias("p_date")
    )
    return out.join(F.broadcast(bl), "p_date", "left_anti")
