"""EAV extraction on the EHR-shape micro-fixture (FIXTURES.md §4):
make_core join shape, typed extraction 1d/2d, wide pivot, combine
degradation — known-answer tests in the reference's style."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inspectehr_spark.operators.extract import (
    Concept, combine, extract, extract_demographics, make_core, make_reference,
)

HR = Concept("heart_rate", "real", "real_2d", meta_columns=("string",))
HEIGHT = Concept("height", "real", "real_1d")
SEX = Concept("sex", "string", "string_1d")


@pytest.fixture(scope="module")
def ehr(spark):
    events = spark.createDataFrame(
        [
            # code, string, datetime, real, integer, episode_id, event_id
            ("heart_rate", "bpm", dt.datetime(2024, 1, 1, 10), 72.0, None, 1, 1),
            ("heart_rate", "bpm", dt.datetime(2024, 1, 1, 11), 80.0, None, 1, 2),
            ("heart_rate", "bpm", dt.datetime(2024, 1, 2, 10), 64.0, None, 2, 3),
            ("height", None, None, 180.0, None, 1, 4),
            ("sex", "F", None, None, None, 1, 5),
            ("sex", "M", None, None, None, 2, 6),
        ],
        "code_name string, string string, datetime timestamp, real double, "
        "integer int, episode_id int, event_id int",
    )
    episodes = spark.createDataFrame(
        [(1, "9434765919", dt.datetime(2024, 1, 1), 10),
         (2, "9434765870", dt.datetime(2024, 1, 2), 11)],
        "episode_id int, nhs_number string, start_date timestamp, provenance int",
    )
    provenance = spark.createDataFrame(
        [(10, "siteA", "f1.csv"), (11, "siteB", "f2.csv")],
        "file_id int, site string, filename string",
    )
    return events, episodes, provenance


def test_make_core_and_reference(spark, ehr):
    events, episodes, provenance = ehr
    core = make_core(events, episodes, provenance)
    assert core.count() == 6
    sites = {(r["episode_id"], r["site"]) for r in core.select("episode_id", "site").distinct().collect()}
    assert sites == {(1, "siteA"), (2, "siteB")}
    ref = make_reference(episodes, provenance)
    assert sorted(ref.columns) == ["episode_id", "nhs_number", "site", "start_date"]


def test_extract_2d_and_1d(spark, ehr):
    events, episodes, provenance = ehr
    core = make_core(events, episodes, provenance)
    hr = extract(core, HR)
    assert set(hr.columns) == {"site", "episode_id", "event_id", "value", "datetime", "meta_1"}
    vals = sorted(r["value"] for r in hr.collect())
    assert vals == [64.0, 72.0, 80.0]
    assert all(r["meta_1"] == "bpm" for r in hr.collect())

    h = extract(core, HEIGHT)
    assert set(h.columns) == {"site", "episode_id", "event_id", "value"}
    assert h.collect()[0]["value"] == 180.0


def test_extract_demographics_pivot(spark, ehr):
    events, episodes, provenance = ehr
    core = make_core(events, episodes, provenance)
    wide = extract_demographics(core, [HEIGHT, SEX])
    rows = {r["episode_id"]: r for r in wide.collect()}
    assert rows[1]["height"] == "180.0" and rows[1]["sex"] == "F"
    assert rows[2]["height"] is None and rows[2]["sex"] == "M"


def test_combine_type_degradation(spark, ehr):
    events, episodes, provenance = ehr
    core = make_core(events, episodes, provenance)
    hr = extract(core, HR)        # value: double
    sex = extract(core, SEX)      # value: string
    both = combine(hr, sex)
    assert dict(both.dtypes)["value"] == "boolean"
    assert both.count() == 5
    same = combine(extract(core, HEIGHT), extract(core, HR).select("site", "episode_id", "event_id", "value"))
    assert dict(same.dtypes)["value"] == "double"


def test_translate_sites_partial_lookup(spark):
    """Broadcast lookup rename with coalesce fallback (reference
    R/extract_data.R:49-71): translated labels rename, unknown labels pass
    through unchanged."""
    from inspectehr_spark.operators.extract import translate_sites

    df = spark.createDataFrame(
        [(1, "RGT"), (2, "RYJ"), (3, "ZZZ")], "episode_id int, site string"
    )
    lookup = spark.createDataFrame(
        [("RGT", "Cambridge"), ("RYJ", "Imperial")], "site string, translated string"
    )
    got = {r["episode_id"]: r["site"] for r in translate_sites(df, lookup).collect()}
    assert got == {1: "Cambridge", 2: "Imperial", 3: "ZZZ"}


def test_write_snapshot_replace_mode(spark, tmp_path):
    """mode='replace' drops and recreates the sink (reference
    dbRemoveTable-then-write, R/perform_evaluation.R:172-174)."""
    import pytest as _pytest

    from inspectehr_spark.sources.readers import write_snapshot

    p = str(tmp_path / "snap")
    a = spark.createDataFrame([(1,)], "x long")
    b = spark.createDataFrame([(2,)], "x long")
    write_snapshot(a, p)
    write_snapshot(b, p)                      # append: both rows
    assert spark.read.parquet(p).count() == 2
    write_snapshot(b, p, mode="replace")      # replace: only the new row
    assert [r["x"] for r in spark.read.parquet(p).collect()] == [2]
    with _pytest.raises(ValueError):
        write_snapshot(a, p, mode="truncate-ish")
