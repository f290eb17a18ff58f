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
