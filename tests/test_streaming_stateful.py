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


def test_transform_with_state_milestones_across_batches(spark, tmp_path):
    """transformWithStateInPandas milestone emitter: state must carry across
    micro-batches (a user crossing 10 only because of the SECOND file batch
    still emits exactly one milestone-10 row), and the final output set must
    equal the batch-twin rule {m : total_events(user) >= m}."""
    from pyspark.sql import functions as F

    import pytest

    from etl_for_dumdums_spark.catalog import Tables
    from etl_for_dumdums_spark.streaming.tws import (
        MILESTONES,
        milestone_stream,
        tws_available,
    )

    from .conftest import SF_SMOKE

    if not tws_available(spark):
        pytest.skip(
            "transformWithStateInPandas needs the protobuf package "
            "(state-server protocol; not installed in this container — "
            "pyspark 4.x lists it under the optional [connect] extra) AND "
            "the RocksDB state store provider on the JVM classpath"
        )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = Tables(spark, SF_SMOKE).events.withColumn("ts", F.col("ts").cast("timestamp"))
    stream_dir = str(tmp_path / "tws_src")
    # stage HALF the events, start the query, then land the second half —
    # milestones crossed only by the combined count prove cross-batch state
    src.filter(F.col("event_id") % 2 == 0).write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    q = (
        milestone_stream(spark.readStream.schema(schema).parquet(stream_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_milestones")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM t_milestones").count()
        src.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["milestone"])
            for r in spark.sql("SELECT * FROM t_milestones").collect()
        }
    finally:
        q.stop()

    totals = {
        r["user_id"]: r["n"]
        for r in src.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    expected = {
        (u, m) for u, n in totals.items() for m in MILESTONES if n >= m
    }
    assert got == expected
    # non-vacuous: the second batch must have produced NEW milestones
    assert len(got) > first
    assert any(m >= 10 for _, m in got)


def test_milestone_processor_logic_with_fake_handle():
    """The StatefulProcessor's crossing logic, driven directly with a fake
    state handle — exercises the Python path even where the protobuf
    state-server protocol is unavailable (the streaming test above)."""
    import pandas as pd

    from etl_for_dumdums_spark.streaming.tws import MilestoneProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema):
            return self.state

    proc = MilestoneProcessor()
    handle = FakeHandle()
    proc.init(handle)

    def feed(n_rows):
        out = list(
            proc.handleInputRows(
                (7,), iter([pd.DataFrame({"x": range(n_rows)})]), None
            )
        )
        return [tuple(r) for pdf in out for r in pdf.itertuples(index=False)]

    # batch 1: 6 events -> crosses 1 only
    assert feed(6) == [(7, 1)]
    # batch 2: 5 more (total 11) -> crosses 10 exactly once, across batches
    assert feed(5) == [(7, 10)]
    # batch 3: 2 more (total 13) -> nothing new
    assert feed(2) == []
    # batch 4: 95 more (total 108) -> crosses 100
    assert feed(95) == [(7, 100)]
    assert handle.state.get() == (108,)
