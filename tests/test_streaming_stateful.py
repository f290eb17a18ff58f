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
