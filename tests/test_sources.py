from pyspark.sql import types as T

from etl_for_dumdums_spark.sources import PaginatedRestSource, StaticSource, run_sync

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ]
)


def test_static_source_sync_and_idempotent_merge(spark, tmp_store):
    src = StaticSource("ds", "tbl", "id", SCHEMA, [{"id": "a", "val": 1}, {"id": "b", "val": 2}])
    path = run_sync(spark, src, tmp_store)
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == [("a", 1), ("b", 2)]

    # incremental re-sync with an overlapping window: update + insert, no dupes
    src2 = StaticSource("ds", "tbl", "id", SCHEMA, [{"id": "b", "val": 20}, {"id": "c", "val": 3}])
    run_sync(spark, src2, tmp_store)
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [("a", 1), ("b", 20), ("c", 3)]


def test_full_refresh_truncates(spark, tmp_store):
    src = StaticSource("ds", "tbl", "id", SCHEMA, [{"id": "a", "val": 1}])
    run_sync(spark, src, tmp_store)
    src2 = StaticSource("ds", "tbl", "id", SCHEMA, [{"id": "z", "val": 9}])
    path = run_sync(spark, src2, tmp_store, full_refresh=True)
    assert [tuple(r) for r in spark.read.parquet(path).collect()] == [("z", 9)]


def test_paginated_rest_source_walks_cursors(spark):
    pages = {
        None: ([{"id": "1", "val": 1}, {"id": "2", "val": 2}], "c1"),
        "c1": ([{"id": "3", "val": 3}], "c2"),
        "c2": ([], None),
    }
    src = PaginatedRestSource(
        lambda cursor: pages[cursor],
        dataset_id="ds",
        table_id="t",
        primary_key="id",
        schema=SCHEMA,
    )
    df = src.read(spark)
    assert df.count() == 3
