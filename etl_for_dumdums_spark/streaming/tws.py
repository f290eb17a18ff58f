"""Spark 4 ``transformWithStateInPandas`` showcase: the new StatefulProcessor
API (the successor surface to applyInPandasWithState — explicit typed state
handles, timers, TTL) driving a per-user MILESTONE emitter: a row is emitted
the moment a user's cumulative event count crosses 1 / 10 / 100 / 1000.

Semantics are order-invariant inside a micro-batch (milestones depend only
on the cumulative COUNT, not on which event crossed it), so replays and
batch boundaries cannot change the output set — the property the batch-twin
parity test pins across a two-stage ingest.

Scale notes: state per user is ONE bigint (the running count) in the state
store partitioned by the grouping key; output is at most 4 rows per user
ever. Production would add a TTL via the handle's timer API to expire idle
users — same bounded-state discipline as streaming/stateful.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

MILESTONES = (1, 10, 100, 1000)

MILESTONE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("milestone", T.LongType()),
    ]
)

_COUNT_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


class MilestoneProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", _COUNT_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues):
        n = self._count.get()[0] if self._count.exists() else 0
        new = sum(len(pdf) for pdf in rows)
        crossed = [m for m in MILESTONES if n < m <= n + new]
        self._count.update((n + new,))
        if crossed:
            yield pd.DataFrame({"user_id": [key[0]] * len(crossed), "milestone": crossed})

    def close(self) -> None:
        pass


def milestone_stream(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """events: a streaming DataFrame. Emits (user_id, milestone) when a
    user's lifetime event count crosses each MILESTONES threshold."""
    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=MilestoneProcessor(),
        outputStructType=MILESTONE_OUT,
        outputMode="append",
        timeMode="None",
    )


def tws_available(spark=None) -> bool:
    """transformWithStateInPandas needs two things this container may lack:
    the protobuf python package (the state-server protocol) and the RocksDB
    state store provider class on the JVM classpath. Both are probed — a
    host with protobuf but no RocksDB provider must SKIP, not fail at
    stream start (r3 advice finding #3). ``spark`` is optional: without an
    active session the JVM probe is skipped (the provider ships in every
    stock Spark 4 distribution; the protobuf package is the usual gap).
    Gate tests on this — same honest-environment-gate pattern as the
    real-Delta merge leg (tests/test_delta_real.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    if spark is not None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        except Exception:
            return False
    return True
