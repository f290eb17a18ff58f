"""The distributed closed-form statistics must equal scipy computed on the
same (collected) data — validating the math, not just cross-engine parity."""

import math

import pytest

scipy_stats = pytest.importorskip("scipy.stats")

from etl_for_dumdums_spark.catalog import EXTRA_QUERIES, QUERIES, load_all  # noqa: E402

from .conftest import SF_SMOKE  # noqa: E402

load_all()
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


@pytest.fixture(scope="module")
def orders_pdf(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderpriority", "o_totalprice", "o_orderdate")
        .toPandas()
    )


def test_anova_f_matches_scipy(spark, orders_pdf):
    row = ALL_QUERIES["stats_anova_f"](spark, SF_SMOKE).collect()[0]
    groups = [g["o_totalprice"].values for _, g in orders_pdf.groupby("o_orderpriority")]
    f_expected, _ = scipy_stats.f_oneway(*groups)
    assert math.isclose(row["f_stat"], f_expected, rel_tol=1e-3)
    assert row["df_between"] == len(groups) - 1
    assert row["df_within"] == len(orders_pdf) - len(groups)


def test_linregress_matches_scipy(spark, orders_pdf):
    row = ALL_QUERIES["stats_linregress"](spark, SF_SMOKE).collect()[0]
    yearly = (
        orders_pdf.assign(yr=orders_pdf["o_orderdate"].dt.year)
        .groupby("yr")["o_totalprice"]
        .mean()
    )
    res = scipy_stats.linregress(yearly.index.values.astype(float), yearly.values)
    assert math.isclose(row["slope"], res.slope, rel_tol=1e-3, abs_tol=1e-3)
    assert math.isclose(row["intercept"], res.intercept, rel_tol=1e-3)
    assert math.isclose(row["r_value"], res.rvalue, rel_tol=1e-3)


def test_ttest_matches_scipy(spark):
    events = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr(
            "value", "dayofweek(timestamp_micros(CAST(ts DIV 1000 AS BIGINT))) AS dow"
        )
        .toPandas()
    )
    weekend = events[events.dow.isin([1, 7])]["value"]
    weekday = events[~events.dow.isin([1, 7])]["value"]
    t_expected, _ = scipy_stats.ttest_ind(weekend, weekday, equal_var=False)
    row = ALL_QUERIES["stats_ttest_welch"](spark, SF_SMOKE).collect()[0]
    assert math.isclose(row["t_stat"], t_expected, rel_tol=1e-3, abs_tol=1e-3)
