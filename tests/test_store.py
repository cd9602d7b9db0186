"""Contract tests for the SnapshotStore interface (sources/store.py):
the file-manifest shim and the writeTo()-shaped catalog adapter must
share commit semantics — staged-data invisibility, atomic multi-table
transaction visibility, keep_prior append vs replace, resume-record
merge, and time travel. Each scenario runs against BOTH implementations
(VERDICT r5 next-round #2); the adapter runs against Spark's built-in
V2 session catalog here and against Iceberg/Delta in a deployment."""

from __future__ import annotations

import uuid

import pytest

from inspectehr_spark.sources.store import FileSnapshotStore, TableCatalogStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "v")


def _vals(df):
    return sorted(r["v"] for r in df.collect())


@pytest.fixture(params=["file", "catalog"])
def store(request, spark, tmp_path):
    if request.param == "file":
        yield FileSnapshotStore(str(tmp_path / "root"))
        return
    prefix = f"spark_catalog.default.cs{uuid.uuid4().hex[:10]}"
    s = TableCatalogStore(spark, prefix)
    yield s
    for name in ("a", "b", "_commits"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{name}")


def test_txn_visibility_all_or_nothing(spark, store):
    # staged data for two tables: present in storage, INVISIBLE to reads
    rel_a = store.write_table_data(_df(spark, 0, 3), "a", 1)
    rel_b = store.write_table_data(_df(spark, 10, 12), "b", 1)
    assert store.latest_version() is None
    with pytest.raises(FileNotFoundError):
        store.read_table(spark, "a")
    # ONE commit publishes both tables + the resume record atomically
    v = store.commit_transaction(
        {"a": [rel_a], "b": [rel_b]}, extra={"dates": ["d1"]}
    )
    assert v == 1 and store.latest_version() == 1
    assert _vals(store.read_table(spark, "a")) == [0, 1, 2]
    assert _vals(store.read_table(spark, "b")) == [10, 11]
    assert store.latest_extra() == {"dates": ["d1"]}


def test_keep_prior_appends_and_merges_dates(spark, store):
    r1 = store.write_table_data(_df(spark, 0, 2), "a", 1)
    store.commit_transaction({"a": [r1]}, extra={"dates": ["d1"]})
    r2 = store.write_table_data(_df(spark, 5, 7), "a", 2)
    v = store.commit_transaction({"a": [r2]}, extra={"dates": ["d2"]})
    assert v == 2
    assert _vals(store.read_table(spark, "a")) == [0, 1, 5, 6]
    assert store.latest_extra()["dates"] == ["d1", "d2"]  # set-union, sorted


def test_replace_drops_prior_content(spark, store):
    r1 = store.write_table_data(_df(spark, 0, 2), "a", 1)
    store.commit_transaction({"a": [r1]}, extra={"dates": ["d1"]})
    r2 = store.write_table_data(_df(spark, 8, 9), "a", 2)
    store.commit_transaction({"a": [r2]}, extra={"x": 1}, keep_prior=False)
    assert _vals(store.read_table(spark, "a")) == [8]
    assert store.latest_extra() == {"x": 1}


def test_time_travel_reads_old_versions(spark, store):
    r1 = store.write_table_data(_df(spark, 0, 2), "a", 1)
    store.commit_transaction({"a": [r1]})
    r2 = store.write_table_data(_df(spark, 5, 7), "a", 2)
    store.commit_transaction({"a": [r2]})
    assert _vals(store.read_table(spark, "a", version=1)) == [0, 1]
    assert _vals(store.read_table(spark, "a", version=2)) == [0, 1, 5, 6]


def test_uncommitted_staging_stays_invisible(spark, store):
    r1 = store.write_table_data(_df(spark, 0, 2), "a", 1)
    store.commit_transaction({"a": [r1]})
    # a crashed run's staged-but-uncommitted batch must never surface
    store.write_table_data(_df(spark, 90, 99), "a", 2)
    assert _vals(store.read_table(spark, "a")) == [0, 1]
    assert store.latest_version() == 1


def test_pipeline_runs_through_catalog_store(spark, tmp_path):
    """run_pipeline consumes only the SnapshotStore interface: the full
    job (three sinks + resume record, one transaction) runs unchanged
    through the catalog adapter, and resume sees the recorded dates."""
    from inspectehr_spark.pipeline import corpus
    from inspectehr_spark.pipeline.run import read_sink, run_pipeline

    path = str(tmp_path / "pages.parquet")
    corpus.write_pages_parquet(path, n=120, seed=7)
    prefix = f"spark_catalog.default.pl{uuid.uuid4().hex[:10]}"
    store = TableCatalogStore(spark, prefix)
    try:
        stats = run_pipeline(
            spark, path, out_dir=str(tmp_path / "unused"), resume=True,
            salt_partitions=4, store=store,
        )
        assert stats["rows"] == 120 and stats["partitions_processed"] > 0
        dec = read_sink(spark, "", "decisions", store=store)
        assert dec.count() == 120
        assert set(store.latest_extra()["dates"])
        # resume through the SAME store: nothing left to process
        stats2 = run_pipeline(
            spark, path, out_dir=str(tmp_path / "unused"), resume=True,
            salt_partitions=4, store=store,
        )
        assert stats2["partitions_processed"] == 0
        assert read_sink(spark, "", "decisions", store=store).count() == 120
    finally:
        for name in ("decisions", "failures", "metrics", "_commits"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{name}")
