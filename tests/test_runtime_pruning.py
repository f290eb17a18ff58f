"""Runtime scan-pruning machinery, proven by plan inspection.

Two Spark features that matter enormously at 100 TB and cost nothing to
use — IF the plan actually engages them. These tests pin that they do:

* Dynamic partition pruning: a fact table partitioned on the join key
  joined to a filtered dim must scan only the partitions the dim's
  filter selects — the plan carries a `dynamicpruningexpression` in the
  fact scan's PartitionFilters.
* Runtime Bloom-filter join pruning: for a shuffle join with a selective
  build side, Spark injects a `might_contain(bloom_filter_agg(...))`
  semi-filter on the probe side, cutting shuffled rows before the join.
  (Locally the 10 GB probe-side threshold is lowered to let the tiny test
  scan qualify; on a cluster the defaults engage by themselves.)
"""

import shutil

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_dynamic_partition_pruning(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumn(
        "ym", F.date_format("l_shipdate", "yyyy-MM")
    )
    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    li.write.mode("overwrite").partitionBy("ym").parquet(fact_path)
    li.select("ym").distinct().withColumn(
        "q",
        F.concat(
            F.substring("ym", 1, 4),
            F.lit("Q"),
            ((F.substring("ym", 6, 2).cast("int") - 1) / 3 + 1).cast("int"),
        ),
    ).write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("q") == "1996Q1")
    j = fact.join(dim, "ym").groupBy("q").agg(F.sum("l_quantity").alias("sq"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan[:2000]
    shutil.rmtree(fact_path), shutil.rmtree(dim_path)


def test_runtime_bloom_filter_join(spark):
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # let the tiny local probe scan qualify (cluster default: 10GB), and
        # force a shuffle join (a broadcast join needs no bloom filter)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]
        # and the pruned join still returns the right answer
        expected = (
            li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey).count()
        )
        assert j.head().n == expected
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
