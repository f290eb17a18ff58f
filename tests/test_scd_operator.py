"""Edge-case tests for the SCD2 interval builder (operators/scd.py):
empty input, single event, same-timestamp ties (tiebreak decides), and
conservation of events across intervals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.scd import scd2_intervals_from_events

COLS = ["user_id", "ts", "event_type", "event_id"]
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )


def _run(spark, rows):
    return scd2_intervals_from_events(
        _df(spark, rows), "user_id", "ts", "event_type", "event_id"
    ).collect()


def test_empty_input(spark):
    assert _run(spark, []) == []


def test_single_event_is_one_open_interval(spark):
    out = _run(spark, [(1, T0, "a", 10)])
    assert len(out) == 1
    r = out[0]
    assert (r["key"], r["attr"], r["valid_to"], r["n_events"]) == (1, "a", None, 1)
    assert r["valid_from"] == T0


def test_runs_collapse_and_chain(spark):
    rows = [
        (1, T0, "a", 1),
        (1, T0 + dt.timedelta(minutes=1), "a", 2),
        (1, T0 + dt.timedelta(minutes=2), "b", 3),
        (1, T0 + dt.timedelta(minutes=3), "a", 4),
    ]
    out = sorted(_run(spark, rows), key=lambda r: r["valid_from"])
    assert [r["attr"] for r in out] == ["a", "b", "a"]
    assert [r["n_events"] for r in out] == [2, 1, 1]
    # intervals chain: each valid_to equals the next valid_from; last open
    for cur, nxt in zip(out, out[1:]):
        assert cur["valid_to"] == nxt["valid_from"]
    assert out[-1]["valid_to"] is None
    assert sum(r["n_events"] for r in out) == len(rows)


def test_timestamp_tie_resolved_by_tiebreak(spark):
    # two events at the SAME ts: event_id order decides run structure
    rows = [(1, T0, "b", 2), (1, T0, "a", 1), (1, T0 + dt.timedelta(minutes=1), "b", 3)]
    out = sorted(_run(spark, rows), key=lambda r: (r["valid_from"], r["attr"]))
    # order by (ts, event_id): a(1), b(2), b(3) -> runs a, then b(2 events)
    attrs = [(r["attr"], r["n_events"]) for r in sorted(out, key=lambda r: r["n_events"])]
    assert ("a", 1) in attrs and ("b", 2) in attrs
    assert len(out) == 2


def test_keys_are_independent(spark):
    rows = [(1, T0, "a", 1), (2, T0, "a", 2)]
    out = _run(spark, rows)
    assert len(out) == 2
    assert all(r["valid_to"] is None for r in out)
