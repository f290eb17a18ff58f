"""Pins for the round-9 optimization rewrites.

Each rewrite here changed an operator's PLAN, never its VALUES — these
tests pin the value equivalence against the original formulation (the
form the oracle has matched since the query landed) on real testdata plus
synthetic edge cases.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_for_dumdums_spark.catalog import Tables, load_all  # noqa: E402

load_all()

from etl_for_dumdums_spark.catalog import QUERIES  # noqa: E402
from etl_for_dumdums_spark.catalog.aggregations import (  # noqa: E402
    _orderstat_percentiles,
)


@pytest.fixture(scope="module")
def spark():
    from etl_for_dumdums_spark.session import get_spark

    s = get_spark("test_optimization_r09")
    yield s


# ---------------------------------------------------------------------------
# agg_global_summary: the histogram order-statistics percentiles must equal
# Spark's exact Percentile aggregate bit-for-bit (same interpolation
# formula, same double reconstruction) — and the split aggregation must
# reproduce the original single-agg row exactly.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_agg_global_summary_matches_original_single_agg(spark, sf):
    d = f"/root/testdata/{sf}"
    t = Tables(spark, d)
    old = t.lineitem.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99_price"),
    ).collect()[0]
    new = QUERIES["agg_global_summary"](spark, d).collect()[0]
    assert old.asDict() == new.asDict()


def test_orderstat_percentiles_interpolation_edges(spark):
    """Synthetic 2-decimal data covering the interpolation branches:
    lower == higher (pos lands on a value), true interpolation between two
    distinct cents, duplicated values, and a single-row frame."""
    cases = [
        # 4 values: p50 pos = 1.5 -> interpolate between idx 1 and 2
        [1.25, 3.50, 3.75, 10.00],
        # 5 values: p50 pos = 2.0 -> lower == higher branch
        [0.01, 0.02, 0.03, 0.04, 100.99],
        # heavy duplication: one histogram row covers many positions
        [2.50] * 7 + [9.99] * 3,
        # single row
        [42.42],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        expected = df.agg(
            F.round(F.percentile("x", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("x", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("x", F.lit(0.99)), 4).alias("p99"),
        ).collect()[0]
        got = _orderstat_percentiles(
            df, "x", [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ).collect()[0]
        assert expected.asDict() == got.asDict(), vals
