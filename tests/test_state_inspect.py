"""Watermark eviction PROVEN from the engine's own state files: the
statestore reader (streaming/state_inspect.py) counts the rows a windowed
aggregation actually holds, before and after the watermark passes."""

import os

from pyspark.sql import functions as F

from etl_for_dumdums_spark.streaming.state_inspect import (
    read_aggregation_state,
    state_operator_metadata,
)

from .conftest import SF_SMOKE


def test_watermark_evicts_closed_windows_from_the_state_store(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .limit(400)
    )
    ev.write.parquet(f"{src}/batch0")
    schema = ev.schema

    stream = (
        spark.readStream.schema(schema)
        .parquet(f"{src}/*")
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .count()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()

    before = read_aggregation_state(spark, ckpt)
    n_before = before.count()
    assert n_before > 0
    # key/value structure matches the aggregation
    assert {f.name for f in before.schema.fields} == {"key", "value", "partition_id"}

    # sentinel batch far in the future: the watermark passes every existing
    # window, so append-mode emits them AND the store must drop their state
    far = ev.limit(1).select(
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"), "event_type"
    )
    far.write.parquet(f"{src}/batch1")
    q.processAllAvailable()
    q.stop()

    after = read_aggregation_state(spark, ckpt)
    n_after = after.count()
    assert n_after < n_before, (n_before, n_after)
    # only the sentinel's own (not-yet-closed) window may remain
    assert n_after <= 2

    md = state_operator_metadata(spark, ckpt).collect()
    assert md and md[0].operatorName == "stateStoreSave"


def test_state_readable_at_an_earlier_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .limit(100)
    )
    ev.write.parquet(f"{src}/batch0")
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(f"{src}/*")
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .count()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    ev.limit(1).select(
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"), "event_type"
    ).write.parquet(f"{src}/batch1")
    q.processAllAvailable()
    q.stop()
    # batch 0's full pre-eviction state is still addressable (time travel)
    at0 = read_aggregation_state(spark, ckpt, batch_id=0).count()
    latest = read_aggregation_state(spark, ckpt).count()
    assert at0 > latest
