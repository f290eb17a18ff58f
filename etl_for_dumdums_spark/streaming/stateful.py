"""Custom stateful streaming operators via applyInPandasWithState.

``streaming_dedup_by_key`` — exactly-once-per-id event stream: per group
key, ids already emitted in *any* earlier micro-batch are dropped (state =
the seen-id set). This is the streaming twin of the batch MERGE-idempotency
guarantee: replaying an overlapping window cannot re-emit rows.

Scale notes: state lives in the state store partitioned by the group key,
so memory is bounded per key; production would add a TTL timeout
(`GroupStateTimeout.ProcessingTimeTimeout` + `state.setTimeoutDuration`)
to expire keys, exactly like the reference's bounded lookback windows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("seen_ids", T.ArrayType(T.LongType()), True)])


def streaming_dedup_by_key(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """events: a streaming DataFrame. Returns rows whose id has not been
    seen before within their key group (across micro-batches)."""
    out_schema = events.schema

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)]
            # also drop duplicates arriving within the same batch
            fresh = fresh.drop_duplicates(subset=[id_col])
            seen.update(int(x) for x in fresh[id_col])
            if len(fresh):
                yield fresh
        state.update((sorted(seen),))

    return events.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ts", T.LongType()),  # epoch seconds
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful sessionizer: the streaming twin of the batch
    `win_sessionize` gap rule (catalog/advanced.py:27 — a new session starts
    when the inactivity gap exceeds ``gap_seconds``).

    State per user = the OPEN session only (start, last-seen, count): O(1)
    per key, the bounded-state shape for unbounded streams. A closed
    session is emitted as soon as the event that breaks the gap arrives;
    the final still-open session stays in state (production would flush it
    with a ProcessingTimeTimeout — same TTL note as streaming_dedup_by_key).
    Within a micro-batch, events are processed in timestamp order per user,
    so replays/micro-batch boundaries cannot split or merge sessions.
    """

    def sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for pdf in pdfs:
            for t in sorted(int(v.timestamp()) for v in pd.to_datetime(pdf[ts_col])):
                if last is None:
                    start, last, n = t, t, 1
                elif t - last > gap_seconds:
                    closed.append((user, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            yield out
        state.update((start, last, n))

    return events.groupBy(user_col).applyInPandasWithState(
        sessionize,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
