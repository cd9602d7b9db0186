"""Planted known-answer tests for the episode composites, mirroring the
reference's testthat strategy (tests/testthat/test_characterise_episodes.R:
5-25 — exact column names, NA-free valid table, exact per-reason counts)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from inspectehr_spark.operators import episodes as E

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _h(hours):
    return T0 + dt.timedelta(hours=hours)


def _wide(spark):
    # (episode_id, nhs, start, src_end, death, bsd_dttm, bsd, outcome, nhs_valid)
    rows = [
        (1, "A1", T0, _h(24), None, None, 0, "A", True),     # valid, los 1d
        (2, "A1", _h(48), None, None, None, 0, "A", True),   # A w/o end → VE_CP_01
        (3, "B2", T0, _h(1), None, None, 0, "E", True),      # no outcome (+ null end)
        (4, "C3", T0, None, _h(24), None, 0, "D", True),     # death end, valid
        (5, "C4", T0, None, _h(24), _h(48), 1, "D", True),   # bsd end, valid, los 2d
        (6, "D5", T0, _h(-1), None, None, 0, "A", True),     # end < start → VE_TP_01
        (7, "E6", T0, _h(5), None, None, 0, "A", False),     # invalid identity
        (8, "F7", T0, _h(10), None, None, 0, "A", True),     # overlapped by 9
        (9, "F7", T0, _h(12), None, None, 0, "A", True),     # dup start
        (10, "G8", T0, _h(24), _h(3), None, 0, "A", True),   # conflicting deaths
        (11, "G8", _h(48), _h(72), _h(5), None, 0, "A", True),
        (12, "H9", T0, _h(6), None, None, 0, "A", True),     # overlaps 13
        (13, "H9", _h(1), _h(6), None, None, 0, "A", True),  # dup end
    ]
    return spark.createDataFrame(
        rows,
        "episode_id long, nhs string, epi_start_dttm timestamp,"
        " src_end_dttm timestamp, death_dttm timestamp, bsd_dttm timestamp,"
        " bsd int, outcome string, nhs_valid boolean",
    )


def test_characterise_episodes_planted(spark):
    table, invalid = E.characterise_episodes(_wide(spark))
    assert table.columns == [
        "episode_id", "nhs_number", "epi_start_dttm", "epi_end_dttm",
        "outcome", "los_days",
    ]
    by_reason: dict[str, set[int]] = {}
    for r in invalid.collect():
        by_reason.setdefault(r["reason"], set()).add(r["episode_id"])
    assert by_reason["invalid nhs number"] == {7}
    assert by_reason["no ICU outcome status"] == {3}
    assert by_reason["duplicate and conflicting death times"] == {10, 11}
    assert by_reason["episode end cannot be reconciled"] == {2, 3}
    assert by_reason["episode length <= 0"] == {6}
    assert by_reason["duplicate start time of episode"] == {9}
    assert by_reason["duplicate end time of episode"] == {13}
    assert by_reason["overlapping episodes"] == {8, 12}

    rows = {r["episode_id"]: r for r in table.collect()}
    assert set(rows) == {1, 4, 5}
    # valid table is NA-free (reference test_characterise_episodes.R:15-25)
    for r in rows.values():
        assert None not in list(r)
    assert rows[1]["los_days"] == 1.0
    assert rows[5]["los_days"] == 2.0
    assert rows[5]["epi_end_dttm"] == _h(48)   # bsd precedence branch
    assert rows[4]["epi_end_dttm"] == _h(24)   # death precedence branch


def test_evaluate_origin_planted(spark):
    _table, invalid = E.characterise_episodes(_wide(spark))
    events = spark.createDataFrame(
        [(100, 1), (101, 2), (102, 2), (103, 7), (104, 5)],
        "event_id long, episode_id long",
    )
    got = E.evaluate_origin(events, invalid)
    assert sorted(r["event_id"] for r in got.collect()) == [101, 102, 103]
    assert got.columns[-2:] == ["eval_code", "description"]
    assert got.select("eval_code").distinct().collect()[0][0] == "VE_RC_04"


def test_evaluate_episodes_blacklist_planted(spark):
    # s1 contributes 3 episodes/day but is silent for 14 days mid-month
    # (absent days >= threshold 10 → month blacklisted); s2 is complete.
    rows = []
    eid = 0
    for day in range(1, 31):
        for k in range(3):
            if not (5 <= day <= 18):
                rows.append((eid, "s1", dt.datetime(2024, 1, day, 8 + k)))
                eid += 1
            rows.append((eid, "s2", dt.datetime(2024, 1, day, 9 + k)))
            eid += 1
    df = spark.createDataFrame(
        rows, "episode_id long, site string, epi_start_dttm timestamp"
    )
    valid, invalid, months = E.evaluate_episodes(df, threshold=10)
    assert [(r["site"], r["year"], r["month"], r["n_bad_days"])
            for r in months.collect()] == [("s1", 2024, 1, 14)]
    assert valid.filter(F.col("site") == "s1").count() == 0
    assert valid.filter(F.col("site") == "s2").count() == 90
    inv_rows = invalid.collect()
    assert len(inv_rows) == 16 * 3  # every s1 episode (16 present days × 3)
    assert {r["code"] for r in inv_rows} == {"VE_CP_03"}
