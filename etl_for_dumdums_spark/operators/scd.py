"""SCD Type-2 interval builder over any change-event frame.

``scd2_intervals_from_events`` turns a (key, ts, attribute) event stream
into validity intervals: consecutive same-attribute runs collapse, each run
becomes [valid_from, valid_to) with the open interval per key current —
the history-keeping twin of the MERGE upsert (io.merge_table keeps only
current rows). The catalog query ``scd2_intervals`` aggregates this
operator's output; tests drive the edge cases (empty input, single event,
timestamp ties, one run per key) directly.

Scale shape: one shuffle on the key; lag + running-sum + lead all ride the
same (key, ts, tiebreak) ordering, so Catalyst chains the WindowExecs
without re-partitioning. State per task is O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_intervals_from_events(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an event stream into SCD2 intervals.

    Returns (key, attr, valid_from, valid_to, n_events) with
    ``valid_to`` NULL on each key's current (open) interval. Ordering is
    fully deterministic via ``tiebreak_col`` — required, because ties on
    ``ts_col`` would otherwise make run boundaries engine-dependent.
    """
    worder = W.partitionBy("key").orderBy("ts", "tb")
    prev = F.lag("attr").over(worder)
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.col(attr_col).alias("attr"),
    ).withColumn("chg", F.when(prev.isNull() | (prev != F.col("attr")), 1).otherwise(0))
    wrun = worder.rowsBetween(W.unboundedPreceding, 0)
    runs = flagged.withColumn("run_id", F.sum("chg").over(wrun))
    intervals = runs.groupBy("key", "attr", "run_id").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    return intervals.withColumn(
        "valid_to",
        F.lead("valid_from").over(W.partitionBy("key").orderBy("valid_from")),
    ).select("key", "attr", "valid_from", "valid_to", "n_events")
