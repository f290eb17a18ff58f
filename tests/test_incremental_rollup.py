"""agg_incremental_rollup: the in-query partial-merge proof must hold, and
the month rollup must conserve the full order count/revenue."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_incremental_rollup_proof_and_conservation(spark):
    import duckdb

    from etl_for_dumdums_spark.catalog.incremental import agg_incremental_rollup

    rows = agg_incremental_rollup(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["n_mismatch_days"] == 0 for r in rows)
    n_orders, revenue = duckdb.sql(
        f"SELECT count(*), sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        f"FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchone()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert abs(sum(r["revenue"] for r in rows) - revenue / 100.0) < 0.01


def test_incremental_split_is_nontrivial(spark):
    """Both partials must be non-empty or the merge proof is vacuous."""
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.catalog.incremental import (
        _ROLLUP_BASE_BUCKETS,
    )
    from etl_for_dumdums_spark.catalog.sketches import _h_spark

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    tag = F.expr(_h_spark("CAST(o_orderkey AS STRING)")) % 10 < _ROLLUP_BASE_BUCKETS
    counts = orders.groupBy(tag.alias("in_base")).count().collect()
    sizes = {r["in_base"]: r["count"] for r in counts}
    assert sizes.get(True, 0) > 0 and sizes.get(False, 0) > 0
