"""study_safely consumer + schema-enforced readers + datetime scalar fns."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inspectehr_spark.functions import datetimefns as dtf
from inspectehr_spark.pipeline import corpus
from inspectehr_spark.pipeline.consume import partition_blacklist, study_safely
from inspectehr_spark.pipeline.run import read_sink, run_pipeline
from inspectehr_spark.sources.readers import (
    DOCUMENTS_SCHEMA, PAGES_SCHEMA, SchemaMismatch, check_schema, read_pages,
)


def test_study_safely_filters(spark, tmp_path):
    pages = str(tmp_path / "pages")
    corpus.write_pages_parquet(pages, n=400, seed=3)
    out = str(tmp_path / "out")
    run_pipeline(spark, pages, out, resume=False)
    clean = study_safely(spark, out, min_pass_rate=0.2)
    dec = read_sink(spark, out, "decisions")
    assert 0 < clean.count() <= dec.filter("keep").count()
    # a 100% floor blacklists every partition (defects are planted per day)
    assert study_safely(spark, out, min_pass_rate=1.01).count() == 0
    mets = read_sink(spark, out, "metrics")
    bl = partition_blacklist(mets, min_pass_rate=1.01)
    assert bl.count() == mets.select("partition_id").distinct().count()


def test_read_pages_schema_checked(spark, tmp_path):
    pages = str(tmp_path / "pages")
    corpus.write_pages_parquet(pages, n=50, seed=5)
    df = read_pages(spark, pages)
    assert [f.name for f in df.schema.fields] == [f.name for f in PAGES_SCHEMA.fields]
    # NTZ → TIMESTAMP coercion happened
    assert dict(df.dtypes)["warc_ts"] == "timestamp"
    # wrong shape rejected
    bad = df.drop("lang")
    with pytest.raises(SchemaMismatch):
        check_schema(bad, PAGES_SCHEMA)
    with pytest.raises(SchemaMismatch):
        check_schema(df, DOCUMENTS_SCHEMA)


def test_datetime_scalars(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 3, 15), "08:30:00"), (dt.date(2024, 3, 16), None)],
        "d date, t string",
    )
    out = df.select(
        dtf.merge_datetime("d", "t").alias("merged"),
        dtf.resolve_date_time("d", "t").alias("resolved"),
        dtf.week_of_month(F.col("d").cast("timestamp")).alias("wom"),
        dtf.round_any(F.lit(17.3), 5.0).alias("r5"),
        F.round(dtf.inv_logit(F.lit(0.0)), 6).alias("half"),
    ).collect()
    assert out[0]["merged"] == dt.datetime(2024, 3, 15, 8, 30)
    assert out[0]["resolved"] == dt.datetime(2024, 3, 15, 8, 30)
    assert out[1]["resolved"] is None
    assert out[0]["wom"] == 3 and out[1]["wom"] == 3
    assert out[0]["r5"] == 15.0 and out[0]["half"] == 0.5


def test_difftime_exact_on_ntz(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(10)
    # must not throw on TIMESTAMP_NTZ input and be microsecond-exact
    rows = ev.select(dtf.difftime_hours("ts", "ts").alias("z")).collect()
    assert all(r["z"] == 0.0 for r in rows)


def test_make_missing_log_schema(spark):
    """Uniform 6-col missing-log stamping (reference create_missing_log,
    R/evaluate_events.R:173-189; schema contract R/utils.R:517-545)."""
    from inspectehr_spark.schemas import MISSING_COLS, make_missing_log

    local = spark.createDataFrame(
        [("s1", "hr", "2024-02-01")],
        "source string, category string, month_start string",
    ).withColumn("month_start", F.col("month_start").cast("date"))
    log = make_missing_log(local, "VE_CP_04", "no contribution this month")
    assert log.columns == MISSING_COLS
    row = log.collect()[0]
    assert (row["year"], row["month"], row["eval_code"]) == (2024, 2, "VE_CP_04")
    # global missingness has no month key → NULL year/month, same schema
    glob = spark.createDataFrame([("s1", "hr")], "source string, category string")
    row2 = make_missing_log(glob, "VE_CP_02", "never contributed").collect()[0]
    assert row2["year"] is None and row2["month"] is None


def test_lookup_concepts():
    from inspectehr_spark.operators.extract import Concept, lookup_concepts

    cs = [Concept("heart_rate", "real", "real_2d"), Concept("height", "real", "real_1d")]
    assert lookup_concepts(cs, code_name="height") == [cs[1]]
    assert lookup_concepts(cs, name_pattern="^hea") == [cs[0]]
    assert lookup_concepts(cs, name_pattern="h") == cs
