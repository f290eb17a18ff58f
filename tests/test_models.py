from etl_for_dumdums_spark.models.reference_dag import build_reference_dag

from .conftest import SF_SMOKE


def test_reference_dag_builds_medallion(spark, tmp_path):
    reg = build_reference_dag(SF_SMOKE, mart_dir=str(tmp_path))
    built = reg.build(spark)

    weekly = built["fct_weekly_order_stats"].collect()
    assert len(weekly) > 50  # multi-year span of weeks
    assert all(r["n_orders"] >= 1 and r["revenue"] > 0 for r in weekly)
    # mart was materialized as parquet
    assert (tmp_path / "fct_weekly_order_stats").exists()

    enriched = built["fct_orders_enriched"]
    assert {"order_id", "customer_name", "segment"} <= set(enriched.columns)
    assert enriched.count() == spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
