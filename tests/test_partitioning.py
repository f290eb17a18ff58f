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
    from etl_for_dumdums_spark.catalog import Tables

    events = Tables(spark, SF_SMOKE).events  # adaptive ts load (ns-long or native)
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


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count join
    with ZERO Exchange operators — the pay-the-shuffle-once-at-write-time
    trade for repeated fact-to-fact joins at scale."""
    from etl_for_dumdums_spark.io import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-BHJ
    try:
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            "o_orderkey",
            n_buckets=8,
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _formatted(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
