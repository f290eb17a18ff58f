import pytest
from pyspark.sql import functions as F

from etl_for_dumdums_spark.io import load_table, merge_table


def _df(spark, rows, cols=("id", "val")):
    return spark.createDataFrame(rows, list(cols))


def _read_sorted(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_merge_creates_when_absent(spark, tmp_store):
    merge_table(spark, _df(spark, [(1, "a"), (2, "b")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "b")]


def test_merge_updates_and_inserts(spark, tmp_store):
    merge_table(spark, _df(spark, [(1, "a"), (2, "b")]), tmp_store, "id")
    merge_table(spark, _df(spark, [(2, "B"), (3, "c")]), tmp_store, "id")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_is_idempotent(spark, tmp_store):
    src = _df(spark, [(1, "a"), (2, "b")])
    merge_table(spark, src, tmp_store, "id")
    merge_table(spark, src, tmp_store, "id")  # re-sync same window: no dupes
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "b")]


def test_merge_schema_evolution_adds_columns(spark, tmp_store):
    merge_table(spark, _df(spark, [(1, "a")]), tmp_store, "id")
    evolved = spark.createDataFrame([(2, "b", 9.5)], ["id", "val", "score"])
    merge_table(spark, evolved, tmp_store, "id")
    out = spark.read.parquet(tmp_store)
    assert set(out.columns) == {"id", "val", "score"}
    rows = {r["id"]: (r["val"], r["score"]) for r in out.collect()}
    assert rows[1] == ("a", None)  # old row got NULL for the new column
    assert rows[2] == ("b", 9.5)


def test_load_table_dispositions(spark, tmp_store):
    load_table(_df(spark, [(1, "a")]), tmp_store, "WRITE_TRUNCATE")
    load_table(_df(spark, [(2, "b")]), tmp_store, "WRITE_APPEND")
    assert _read_sorted(spark, tmp_store) == [(1, "a"), (2, "b")]
    load_table(_df(spark, [(9, "z")]), tmp_store, "WRITE_TRUNCATE")
    assert _read_sorted(spark, tmp_store) == [(9, "z")]
    with pytest.raises(Exception):
        load_table(_df(spark, [(1, "x")]), tmp_store, "WRITE_EMPTY")
    with pytest.raises(ValueError):
        load_table(_df(spark, [(1, "x")]), tmp_store, "NOT_A_MODE")


def test_dynamic_partition_overwrite_touches_only_landed_partitions(spark, tmp_path):
    """dynamic=True replaces ONLY the partitions present in the incoming
    frame; static overwrite would drop every other partition."""
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.io import write_partitioned

    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [(d, i, v) for d in ("2024-01-01", "2024-01-02", "2024-01-03")
         for i, v in ((1, 10), (2, 20))],
        "day string, id int, v int",
    )
    write_partitioned(base, path, "day")
    assert spark.read.parquet(path).count() == 6

    # re-land ONLY day 2 with corrected values
    fix = spark.createDataFrame([("2024-01-02", 9, 99)], "day string, id int, v int")
    write_partitioned(fix, path, "day", dynamic=True)
    got = spark.read.parquet(path)
    assert got.count() == 5  # 2+1+2 — days 1 and 3 untouched
    assert got.where(F.col("day") == "2024-01-02").collect()[0]["v"] == 99
    assert got.where(F.col("day") == "2024-01-01").count() == 2

    # contrast: static overwrite replaces the whole table
    write_partitioned(fix, path, "day")
    assert spark.read.parquet(path).count() == 1
