"""Partitioned-write + partition-pruning behavior (the scale feature the
reference approximates with derived period columns)."""

from pyspark.sql import functions as F

from etl_for_dumdums_spark.functions import month_start
from etl_for_dumdums_spark.io import write_partitioned

from .conftest import SF_SMOKE


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "events_by_month")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
    )
    write_partitioned(
        events.withColumn("event_month", month_start(F.col("ts"))), out, "event_month"
    )

    back = spark.read.parquet(out)
    assert back.count() == events.count()

    pruned = back.filter(F.col("event_month") == "2024-01-01")
    plan = _formatted(pruned)
    # the month filter lands in PartitionFilters (directory pruning),
    # not in the row-level data filters
    assert "PartitionFilters" in plan
    assert "event_month" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert pruned.count() > 0
