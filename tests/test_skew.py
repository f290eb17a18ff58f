from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # heavily skewed fact: 90% of rows share key 1
    fact = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 1000 + k) for k in range(2, 12)],
        ["key", "payload"],
    )
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(1, 12)], ["key", "name"])

    plain = {(r["key"], r["payload"], r["name"]) for r in fact.join(dim, "key").collect()}
    salted = {
        (r["key"], r["payload"], r["name"]) for r in salted_join(fact, dim, "key").collect()
    }
    assert salted == plain
    assert len(salted) == 100


def test_salted_join_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(1000)], ["key", "payload"])
    dim = spark.createDataFrame([(1, "hot")], ["key", "name"])
    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * 8).cast("int"))
    n_buckets = salted_fact.select("_salt").distinct().count()
    assert n_buckets == 8  # the single hot key fans out over all salts
    assert salted_join(fact, dim, "key").count() == 1000
