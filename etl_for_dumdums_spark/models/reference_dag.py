"""A representative slice of the reference's dbt DAG on the runner.

Medallion layering (CLAUDE.md:30-38): staging views rename/clean, an
intermediate model derives periods, marts aggregate — the same
raw → stg_* → int_* → fct_* flow, with the week-stats mart mirroring
fct_hn_weekly_stats.sql and the enriched-orders mart mirroring the
fct_issues join pattern.

``build_reference_dag(spark, sf_dir)`` returns the registry; callers run
``registry.build(spark)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import week_start
from ..runner import ModelRegistry


def build_reference_dag(sf_dir: str, mart_dir: str | None = None) -> ModelRegistry:
    reg = ModelRegistry()

    @reg.model("stg_orders")
    def stg_orders(spark):
        return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total_price"),
            F.col("o_orderdate").alias("ordered_at"),
            F.col("o_orderpriority").alias("priority"),
        )

    @reg.model("stg_customers")
    def stg_customers(spark):
        return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_nationkey").alias("nation_id"),
            F.col("c_mktsegment").alias("segment"),
        )

    @reg.model("int_orders_weekly", deps=["stg_orders"])
    def int_orders_weekly(spark, stg_orders):
        return stg_orders.withColumn("order_week", week_start(F.col("ordered_at")))

    @reg.model(
        "fct_weekly_order_stats",
        deps=["int_orders_weekly"],
        materialization="table" if mart_dir else "view",
        path=f"{mart_dir}/fct_weekly_order_stats" if mart_dir else None,
    )
    def fct_weekly_order_stats(spark, int_orders_weekly):
        return (
            int_orders_weekly.groupBy("order_week")
            .agg(
                F.count("*").alias("n_orders"),
                F.count_distinct("customer_id").alias("n_customers"),
                F.round(F.sum("total_price"), 2).alias("revenue"),
                F.round(F.avg("total_price"), 2).alias("avg_order_value"),
            )
            .orderBy("order_week")
        )

    @reg.model("fct_orders_enriched", deps=["stg_orders", "stg_customers"])
    def fct_orders_enriched(spark, stg_orders, stg_customers):
        # no broadcast hint: customers grow with SF — AQE picks broadcast at
        # small scale, a co-partitioned shuffle join at large
        return stg_orders.join(stg_customers, "customer_id", "left")

    return reg
