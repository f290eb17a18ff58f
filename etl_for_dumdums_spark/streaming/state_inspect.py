"""Streaming state-store introspection (Spark 4 ``statestore`` source).

Two readers over a streaming query's checkpoint — the engine's OWN state
files, not the query output — plus the property they make testable: that a
watermark genuinely EVICTS closed windows/sessions, i.e. the state a
stateful operator holds is bounded by the watermark horizon, not by stream
history. tests/test_state_inspect.py proves eviction by counting state rows
before and after the watermark passes a window.

At 100 TB this is the operational tool for the streaming pipelines in this
repo (streaming/corpus.py's dedup state, the windowed aggregations): state
size per partition is directly observable, so a state leak (e.g. a missing
watermark) is a one-query diagnosis instead of an executor-memory autopsy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_aggregation_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """State rows (key struct, value struct, partition_id) of a stateful
    operator at ``batch_id`` (default: the latest committed batch)."""
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)


def state_operator_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator state metadata (name, store, partitions, batch range)."""
    return spark.read.format("state-metadata").load(checkpoint)
