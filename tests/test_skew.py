"""salt_partitions_by_size: hard giant-balance guarantee + pipeline
placement-invariance (decisions don't depend on the salt strategy)."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F


def _skewed_pages(spark, n_small=400, n_giant=13, giant_kb=64):
    """Small docs plus giants whose urls are CRAFTED to hash-collide-ish:
    sequential giant urls under one prefix — the adversarial case the
    uniform salt only survives in expectation."""
    small = spark.range(n_small).select(
        F.concat(F.lit("https://s/"), "id").alias("url"),
        F.encode(F.concat(F.lit("<p>doc "), "id", F.lit("</p>")), "utf-8").alias("html"),
    )
    giant = spark.range(n_giant).select(
        F.concat(F.lit("https://g/"), "id").alias("url"),
        F.encode(
            F.concat(F.lit("<p>"), F.repeat(F.lit("waffle "), giant_kb * 160), F.lit("</p>")),
            "utf-8",
        ).alias("html"),
    )
    return small.unionByName(giant)


def test_giant_balance_hard_bound(spark):
    from inspectehr_spark.operators.skew import salt_partitions_by_size

    n_part, n_giant = 8, 13
    pages = _skewed_pages(spark, n_giant=n_giant)
    out = salt_partitions_by_size(pages, n_part, giant_bytes=1 << 16)
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .withColumn("is_giant", F.octet_length("html") >= F.lit(1 << 16))
        .groupBy("pid")
        .agg(
            F.sum(F.col("is_giant").cast("int")).alias("giants"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    assert sum(r["rows"] for r in per_part) == 413
    bound = math.ceil(n_giant / n_part)
    assert max(r["giants"] for r in per_part) <= bound, per_part
    # giants actually spread: more than one partition carries one
    assert sum(1 for r in per_part if r["giants"] > 0) >= min(n_giant, n_part) - 1

    # deterministic: same placement on re-evaluation
    a = sorted(
        (r["url"], r["pid"])
        for r in out.withColumn("pid", F.spark_partition_id()).select("url", "pid").collect()
    )
    b = sorted(
        (r["url"], r["pid"])
        for r in salt_partitions_by_size(pages, n_part, giant_bytes=1 << 16)
        .withColumn("pid", F.spark_partition_id())
        .select("url", "pid")
        .collect()
    )
    assert a == b


def test_pipeline_size_salt_identical_decisions(spark, tmp_path_factory):
    """run_pipeline(salt_strategy='size') commits byte-identical decisions
    to the hash salt — placement must never leak into results."""
    from inspectehr_spark.pipeline import corpus
    from inspectehr_spark.pipeline.run import read_sink, run_pipeline

    d = tmp_path_factory.mktemp("size_salt")
    path = os.path.join(str(d), "pages.parquet")
    corpus.write_pages_parquet(path, n=300, seed=3)

    def decisions(out):
        return {
            r["url"]: (r["keep"], r["first_fail_code"], r["scrubbed_text"])
            for r in read_sink(spark, out, "decisions").collect()
        }

    out_h = str(tmp_path_factory.mktemp("out_hash"))
    run_pipeline(spark, path, out_h, resume=False, salt_partitions=8)
    out_s = str(tmp_path_factory.mktemp("out_size"))
    run_pipeline(spark, path, out_s, resume=False, salt_partitions=8,
                 salt_strategy="size")
    assert decisions(out_h) == decisions(out_s)

    import pytest

    with pytest.raises(ValueError):
        run_pipeline(spark, path, out_s, resume=False, salt_partitions=8,
                     salt_strategy="nope")
