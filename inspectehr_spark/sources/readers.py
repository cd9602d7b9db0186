"""Schema-enforced sources.

The reference trusts a fixed relational schema and coerces defensively at
extraction (R/extract_data.R:120-133 — SQLite stores temporals as strings).
Spark analog: declare the expected StructType, verify the scanned schema
against it (names + types, order-insensitive) and fail fast — silent
schema drift at 10^12 rows is unrecoverable downstream.

Iceberg: in production the pages/metrics tables are Iceberg
(`spark.read.format("iceberg")`, `writeTo(...).append()`); this container
has no Iceberg runtime jar, so `read_table` gates on catalog availability
and falls back to parquet paths with identical semantics for everything
downstream (resume anti-join works on any snapshot source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

# BASELINE.json input_hint schema (warc_ts may surface as NTZ from parquet)
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


class SchemaMismatch(ValueError):
    pass


def check_schema(df: DataFrame, expected: StructType, coerce: bool = True) -> DataFrame:
    """Verify names are exactly the expected set; cast type drift (e.g.
    TIMESTAMP_NTZ → TIMESTAMP, INT → BIGINT) when `coerce`, else raise."""
    got = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in expected.fields}
    if set(got) != set(want):
        raise SchemaMismatch(
            f"column mismatch: got {sorted(got)}, want {sorted(want)}"
        )
    drift = {n: (got[n], want[n]) for n in want if got[n] != want[n]}
    if not drift:
        return df.select(*[f.name for f in expected.fields])
    if not coerce:
        raise SchemaMismatch(f"type drift: {drift}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in expected.fields]
    )


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, location: str) -> DataFrame:
    """Read the pages table from an Iceberg identifier (catalog.db.table)
    when the runtime has Iceberg, else a parquet path. Schema-checked."""
    if "/" not in location and iceberg_available(spark):
        df = spark.read.format("iceberg").load(location)
    else:
        df = spark.read.parquet(location)
    return check_schema(df, PAGES_SCHEMA)


def write_snapshot(
    df: DataFrame,
    location: str,
    partition_col: str | None = None,
    mode: str = "append",
) -> None:
    """Write a snapshot: Iceberg `writeTo(...)` when available, else
    partitioned parquet (same layout the resume manifest reads).

    mode="append" adds to the table; mode="replace" drops and recreates it
    — the reference's dbRemoveTable-then-write output path
    (R/perform_evaluation.R:172-174,192-194,221-223), Iceberg
    createOrReplace / parquet overwrite here."""
    if mode not in ("append", "replace"):
        raise ValueError(f"unknown write mode: {mode!r}")
    spark = df.sparkSession
    if "/" not in location and iceberg_available(spark):
        if mode == "append":
            df.writeTo(location).append()
        else:
            df.writeTo(location).createOrReplace()
        return
    w = df.write.mode("append" if mode == "append" else "overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(location)
