"""exact_quantiles_cents (lockstep multi-probe bisection) must equal both
the single-q path and Spark's exact percentile, including the
interpolated and the exact-rank cases."""

import pytest
from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.quantile import (
    exact_quantile_cents,
    exact_quantiles_cents,
)


def test_multi_matches_single_and_percentile(spark):
    vals = [round(1.0 + 0.07 * i, 2) for i in range(101)] + [3.14, 3.14, 99.99]
    df = spark.createDataFrame([(v,) for v in vals], "price double")
    qs = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    multi = exact_quantiles_cents(df, "price", qs)
    for q, got in zip(qs, multi):
        single = exact_quantile_cents(df, "price", q)
        assert got == pytest.approx(single, abs=1e-9), q
        ref = df.agg(F.percentile("price", F.lit(q))).collect()[0][0]
        assert got == pytest.approx(ref, abs=1e-9), q


def test_multi_empty(spark):
    import math

    df = spark.createDataFrame([], "price double")
    out = exact_quantiles_cents(df, "price", (0.5, 0.9))
    assert all(math.isnan(v) for v in out)
