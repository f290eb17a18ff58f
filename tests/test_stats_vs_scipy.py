"""The distributed closed-form statistics must equal an INDEPENDENT local
implementation computed on the same (collected) data — validating the math,
not just cross-engine parity.

The reference values are the textbook closed forms evaluated with numpy on
the driver (scipy-equivalent: f_oneway, linregress, Welch ttest_ind — cross
-checked against scipy where it is installed, but the container ships
without it, so the test must not depend on the import)."""

import math

import numpy as np
import pytest

from etl_for_dumdums_spark.catalog import EXTRA_QUERIES, QUERIES, load_all

from .conftest import SF_SMOKE

load_all()
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}


def _f_oneway(groups):
    """One-way ANOVA F statistic (scipy.stats.f_oneway equivalent)."""
    all_vals = np.concatenate(groups)
    grand = all_vals.mean()
    ss_between = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ss_within = sum(((g - g.mean()) ** 2).sum() for g in groups)
    df_b = len(groups) - 1
    df_w = len(all_vals) - len(groups)
    return (ss_between / df_b) / (ss_within / df_w)


def _linregress(x, y):
    """OLS slope/intercept/r (scipy.stats.linregress equivalent)."""
    x, y = np.asarray(x, dtype=float), np.asarray(y, dtype=float)
    xm, ym = x.mean(), y.mean()
    sxx = ((x - xm) ** 2).sum()
    sxy = ((x - xm) * (y - ym)).sum()
    syy = ((y - ym) ** 2).sum()
    slope = sxy / sxx
    return slope, ym - slope * xm, sxy / math.sqrt(sxx * syy)


def _ttest_welch(a, b):
    """Welch's unequal-variance t statistic (ttest_ind(equal_var=False))."""
    a, b = np.asarray(a, dtype=float), np.asarray(b, dtype=float)
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    return (a.mean() - b.mean()) / math.sqrt(va + vb)


def test_reference_impls_match_scipy_when_available():
    """Cross-check the local closed forms against scipy on synthetic data —
    runs only where scipy exists (not this container), documenting that the
    constants below are genuinely scipy-equivalent."""
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.RandomState(7)
    g = [rng.normal(i, 1.0, 40 + i) for i in range(3)]
    assert math.isclose(_f_oneway(g), scipy_stats.f_oneway(*g)[0], rel_tol=1e-12)
    x, y = np.arange(20.0), rng.normal(0, 1, 20) + 0.5 * np.arange(20.0)
    res = scipy_stats.linregress(x, y)
    slope, intercept, r = _linregress(x, y)
    assert math.isclose(slope, res.slope, rel_tol=1e-12)
    assert math.isclose(intercept, res.intercept, rel_tol=1e-12)
    assert math.isclose(r, res.rvalue, rel_tol=1e-12)
    a, b = rng.normal(0, 1, 50), rng.normal(0.3, 2, 70)
    assert math.isclose(
        _ttest_welch(a, b), scipy_stats.ttest_ind(a, b, equal_var=False)[0], rel_tol=1e-12
    )


@pytest.fixture(scope="module")
def orders_pdf(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderpriority", "o_totalprice", "o_orderdate")
        .toPandas()
    )


def test_anova_f_matches_reference(spark, orders_pdf):
    row = ALL_QUERIES["stats_anova_f"](spark, SF_SMOKE).collect()[0]
    groups = [g["o_totalprice"].values for _, g in orders_pdf.groupby("o_orderpriority")]
    assert math.isclose(row["f_stat"], _f_oneway(groups), rel_tol=1e-3)
    assert row["df_between"] == len(groups) - 1
    assert row["df_within"] == len(orders_pdf) - len(groups)


def test_linregress_matches_reference(spark, orders_pdf):
    row = ALL_QUERIES["stats_linregress"](spark, SF_SMOKE).collect()[0]
    yearly = (
        orders_pdf.assign(yr=orders_pdf["o_orderdate"].dt.year)
        .groupby("yr")["o_totalprice"]
        .mean()
    )
    slope, intercept, r = _linregress(yearly.index.values.astype(float), yearly.values)
    assert math.isclose(row["slope"], slope, rel_tol=1e-3, abs_tol=1e-3)
    assert math.isclose(row["intercept"], intercept, rel_tol=1e-3)
    # r_value is rounded in the query output: allow half a rounding cell
    assert math.isclose(row["r_value"], r, rel_tol=1e-3, abs_tol=5e-4)


def test_ttest_matches_reference(spark):
    from etl_for_dumdums_spark.catalog import Tables

    events = (
        Tables(spark, SF_SMOKE)
        .events.selectExpr("value", "dayofweek(ts) AS dow")
        .toPandas()
    )
    weekend = events[events.dow.isin([1, 7])]["value"]
    weekday = events[~events.dow.isin([1, 7])]["value"]
    row = ALL_QUERIES["stats_ttest_welch"](spark, SF_SMOKE).collect()[0]
    assert math.isclose(row["t_stat"], _ttest_welch(weekend, weekday), rel_tol=1e-3, abs_tol=1e-3)
