from pyspark.sql import functions as F

from etl_for_dumdums_spark.runner import ModelRegistry


def test_topo_order_and_build(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("base")
    def base(spark):
        return spark.createDataFrame([(1, 10.0), (2, 20.0), (2, 5.0)], ["k", "v"])

    @reg.model("agg", deps=["base"], materialization="table", path=str(tmp_path / "agg"))
    def agg(spark, base):
        return base.groupBy("k").agg(F.sum("v").alias("total"))

    reg.sql_model("top", "SELECT k, total FROM agg WHERE total > 12", deps=["agg"])

    order = reg.topo_order()
    assert order.index("base") < order.index("agg") < order.index("top")

    built = reg.build(spark)
    assert sorted(tuple(r) for r in built["top"].collect()) == [(2, 25.0)]
    # table materialization wrote parquet and registered a view
    assert (tmp_path / "agg").exists()
    assert spark.sql("SELECT count(*) AS n FROM agg").collect()[0]["n"] == 2


def test_build_subset_only_builds_needed(spark):
    reg = ModelRegistry()

    @reg.model("a")
    def a(spark):
        return spark.createDataFrame([(1,)], ["x"])

    @reg.model("b", deps=["a"])
    def b(spark, a):
        return a

    @reg.model("unrelated")
    def unrelated(spark):
        raise AssertionError("should not be built")

    built = reg.build(spark, targets=["b"])
    assert set(built) == {"a", "b"}
