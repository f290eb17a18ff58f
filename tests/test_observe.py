"""Observation-API load metrics (operators/observe.py): single-pass
in-flight DQ — metrics come from the SAME action that consumed the frame."""

from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.observe import check_contract, observed

from .conftest import SF_SMOKE


def test_observed_metrics_from_a_single_action(spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "maybe_null", F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(1)
    )
    out, obs = observed(df, null_cols=["maybe_null"], name="orders_load")
    out.write.mode("overwrite").parquet(str(tmp_path / "out"))  # the ONE action
    got = obs.get
    expected_rows = df.count()
    expected_nulls = df.filter(F.col("maybe_null").isNull()).count()
    assert got["rows"] == expected_rows
    assert got["nulls_maybe_null"] == expected_nulls

    verdict = check_contract(
        obs,
        {
            "rows": lambda v: v > 0,
            "nulls_maybe_null": lambda v: v < expected_rows,
        },
    )
    assert verdict == {"rows": True, "nulls_maybe_null": True}


def test_contract_failure_is_reported_not_raised(spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    out, obs = observed(df, name="nation_load")
    out.write.mode("overwrite").parquet(str(tmp_path / "out"))
    verdict = check_contract(obs, {"rows": lambda v: v > 10**9})
    assert verdict == {"rows": False}
