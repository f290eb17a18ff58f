"""Spark 4 Python DataSource (sources/pydatasource.py): partitioned JSONL
read, schema contract, and file-pruning filter pushdown."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    from etl_for_dumdums_spark.sources.pydatasource import dump_events_jsonl

    d = str(tmp_path_factory.mktemp("jsonl_events"))
    n = dump_events_jsonl(SF_SMOKE, d)
    assert n > 0
    return d


def test_roundtrip_matches_parquet(spark, jsonl_dir):
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.sources.pydatasource import register_python_datasources

    register_python_datasources(spark)
    got = spark.read.format("jsonl_events").option("path", jsonl_dir).load()
    exp = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )
    assert got.count() == exp.count()
    assert [f.name for f in got.schema.fields] == [f.name for f in exp.schema.fields]
    # full value equality, order-insensitive
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_partitions_one_per_file(jsonl_dir):
    import os

    from etl_for_dumdums_spark.sources.pydatasource import JsonlEventsReader

    r = JsonlEventsReader({"path": jsonl_dir})
    files = sorted(f for f in os.listdir(jsonl_dir) if f.endswith(".jsonl"))
    assert [os.path.basename(p.path) for p in r.partitions()] == files
    assert len(files) == 5  # one per event_type


def test_push_filters_prunes_files_and_returns_rest(jsonl_dir):
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from etl_for_dumdums_spark.sources.pydatasource import JsonlEventsReader

    r = JsonlEventsReader({"path": jsonl_dir})
    rest = list(
        r.pushFilters(
            [EqualTo(("event_type",), "view"), GreaterThan(("value",), 1.0)]
        )
    )
    # the layout filter is consumed; the value filter is handed back
    assert rest == [GreaterThan(("value",), 1.0)]
    assert [p.path.rsplit("/", 1)[1] for p in r.partitions()] == ["view.jsonl"]

    # In() narrows; a second conflicting push intersects to the empty set
    r2 = JsonlEventsReader({"path": jsonl_dir})
    assert list(r2.pushFilters([In(("event_type",), ("view", "click"))])) == []
    assert len(r2.partitions()) == 2
    assert list(r2.pushFilters([EqualTo(("event_type",), "purchase")])) == []
    assert r2.partitions() == []


def test_end_to_end_filtered_read_matches(spark, jsonl_dir):
    from etl_for_dumdums_spark.sources.pydatasource import register_python_datasources

    register_python_datasources(spark)
    got = (
        spark.read.format("jsonl_events")
        .option("path", jsonl_dir)
        .load()
        .where("event_type = 'purchase' AND value > 100")
        .count()
    )
    exp = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where("event_type = 'purchase' AND value > 100")
        .count()
    )
    assert got == exp and got > 0
