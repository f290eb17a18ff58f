"""Drive the stateful streaming dedup across two micro-batches: overlapping
re-delivery in the second batch must not re-emit rows."""

import datetime as dt

from pyspark.sql import types as T

from etl_for_dumdums_spark.streaming.stateful import streaming_dedup_by_key

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _write_batch(spark, path, rows, batch_id):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        f"{path}/b{batch_id}"
    )


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    chk = str(tmp_path / "chk")
    # batch 1: events 1-4 (with an in-batch duplicate of 2)
    batch1 = [(1, 10, 1.0), (2, 10, 2.0), (2, 10, 2.0), (3, 11, 3.0), (4, 11, 4.0)]
    _write_batch(spark, src, batch1, 1)

    stream = spark.readStream.schema(SCHEMA).option("pathGlobFilter", "*.parquet").parquet(
        f"{src}/*"
    )
    deduped = streaming_dedup_by_key(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert first == {1, 2, 3, 4}

        # batch 2: re-delivers 2 and 4 (overlapping window), adds 5 and 6
        batch2 = [(2, 10, 2.0), (4, 11, 4.0), (5, 10, 5.0), (6, 12, 6.0)]
        _write_batch(spark, src, batch2, 2)
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id, count(*) AS n FROM dedup_out GROUP BY 1").collect()
        counts = {r["event_id"]: r["n"] for r in rows}
        # every id exactly once; re-delivered 2/4 were suppressed by state
        assert counts == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
    finally:
        q.stop()


S_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def test_streaming_sessionize_gap_rule(spark, tmp_path):
    """Sessions close when the 30-min gap is exceeded — across micro-batches
    — and the still-open session is held in state, not emitted."""
    from etl_for_dumdums_spark.streaming.stateful import streaming_sessionize

    src = str(tmp_path / "sess_src")
    chk = str(tmp_path / "sess_chk")
    # user 10: events at 0,10,20 min (one session), then 60 min (new session)
    # user 11: events at 0 min then 90,95 min
    batch1 = [(10, _ts(0)), (10, _ts(10)), (10, _ts(20)), (11, _ts(0))]
    spark.createDataFrame(batch1, S_SCHEMA).coalesce(1).write.mode("append").parquet(f"{src}/b1")

    stream = spark.readStream.schema(S_SCHEMA).option("pathGlobFilter", "*.parquet").parquet(
        f"{src}/*"
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing closed yet: both users' first sessions still open in state
        assert spark.sql("SELECT * FROM sess_out").count() == 0

        batch2 = [(10, _ts(60)), (11, _ts(90)), (11, _ts(95))]
        spark.createDataFrame(batch2, S_SCHEMA).coalesce(1).write.mode("append").parquet(
            f"{src}/b2"
        )
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        # the gap-breaking events closed exactly the two first sessions
        assert rows == {
            (10, _ts(0), _ts(20), 3),
            (11, _ts(0), _ts(0), 1),
        }
    finally:
        q.stop()
