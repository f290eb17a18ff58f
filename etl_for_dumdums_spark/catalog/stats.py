"""Statistics / time-series analytics (SURVEY.md §2.11 T1-T5).

The reference computes these with scipy over collected pandas frames; here
they are fully distributed: every statistic reduces to sums/means/variances
per group, combined with closed-form expressions — no data ever leaves the
executors, so they run at any SF. Results match the scipy definitions
(verified in tests against scipy on collected data).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import ROUND_DP as DP
from . import Tables, register

R = lambda c: F.round(c, DP)  # noqa: E731

_DAILY_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
"""


def _daily(t):
    return t.orders.groupBy(F.col("o_orderdate").cast("date").alias("order_date")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


_ACF_LAGS = list(range(1, 8))


# ---------------------------------------------------------------------------
# T1+T2 — one-way ANOVA F across order priorities AND Welch's t-test weekend
# vs weekday, both from group aggregates only (no collect), joined into one
# single-row result (reference pages/Oura_Investigation.py:90-93,253-259).
# Merged from r01 stats_anova_f + stats_ttest_welch (kept below as extras).
# ---------------------------------------------------------------------------
@register(
    "stats_group_tests",
    sql=f"""
    WITH g AS (
      SELECT o_orderpriority, count(*) AS n, avg(o_totalprice) AS mean,
             var_pop(o_totalprice) * count(*) AS ss_within
      FROM orders GROUP BY o_orderpriority),
    tot AS (
      SELECT sum(n * mean) / sum(n) AS grand_mean, sum(n) AS n_total,
             count(*) AS k FROM g),
    anova AS (
      SELECT CAST(tot.k - 1 AS BIGINT) AS df_between,
             CAST(tot.n_total - tot.k AS BIGINT) AS df_within,
             round((sum(g.n * (g.mean - tot.grand_mean) ^ 2) / (tot.k - 1))
                   / (sum(g.ss_within) / (tot.n_total - tot.k)), {DP}) AS f_stat
      FROM g CROSS JOIN tot
      GROUP BY tot.k, tot.n_total),
    wgrouped AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END AS grp,
             count(*) AS n, avg(value) AS mean, var_samp(value) AS var
      FROM events GROUP BY 1),
    welch AS (
      SELECT round((max(CASE WHEN grp = 'weekend' THEN mean END)
                    - max(CASE WHEN grp = 'weekday' THEN mean END))
                   / sqrt(max(CASE WHEN grp = 'weekend' THEN var / n END)
                          + max(CASE WHEN grp = 'weekday' THEN var / n END)), {DP}) AS t_stat,
             max(CASE WHEN grp = 'weekend' THEN n END) AS n_weekend,
             max(CASE WHEN grp = 'weekday' THEN n END) AS n_weekday
      FROM wgrouped)
    SELECT anova.df_between, anova.df_within, anova.f_stat,
           welch.t_stat, welch.n_weekend, welch.n_weekday
    FROM anova CROSS JOIN welch
    """,
)
def stats_group_tests(spark, sf_dir):
    anova = stats_anova_f(spark, sf_dir)
    welch = stats_ttest_welch(spark, sf_dir)
    return anova.crossJoin(F.broadcast(welch))


# ---------------------------------------------------------------------------
# T3+T4 — time-series panel: linear trend over yearly aggregates AND the
# lag-1..7 autocorrelation function, as ONE single-row wide result. The ACF
# is a single aggregation over one lagged projection (one window, one
# Exchange) — not 7 unioned re-aggregations (the r01 stats_autocorr shape).
# (reference pages/Oura_Investigation.py:220-221,309-323.)
# Merged from r01 stats_linregress + stats_autocorr (kept below as extras).
# ---------------------------------------------------------------------------
@register(
    "stats_timeseries",
    sql=f"""
    WITH daily AS ({_DAILY_SQL}),
    lagged AS (
      SELECT revenue,
             {', '.join(f'lag(revenue, {k}) OVER (ORDER BY order_date) AS lag_{k}' for k in _ACF_LAGS)}
      FROM daily),
    acf AS (
      SELECT {', '.join(f'round(corr(revenue, lag_{k}), {DP}) AS acf_{k}' for k in _ACF_LAGS)},
             count(lag_1) AS n_pairs_1
      FROM lagged),
    yearly AS (
      SELECT CAST(extract(year FROM o_orderdate) AS DOUBLE) AS yr,
             avg(o_totalprice) AS avg_revenue
      FROM orders GROUP BY 1),
    trend AS (
      SELECT round(regr_slope(avg_revenue, yr), {DP})     AS slope,
             round(regr_intercept(avg_revenue, yr), {DP}) AS intercept,
             round(corr(avg_revenue, yr), {DP})           AS r_value,
             count(*) AS n_years
      FROM yearly)
    SELECT trend.slope, trend.intercept, trend.r_value, trend.n_years,
           {', '.join(f'acf.acf_{k}' for k in _ACF_LAGS)}, acf.n_pairs_1
    FROM trend CROSS JOIN acf
    """,
)
def stats_timeseries(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.orderBy("order_date")
    lagged = _daily(t).select(
        "revenue", *[F.lag("revenue", k).over(w).alias(f"lag_{k}") for k in _ACF_LAGS]
    )
    acf = lagged.agg(
        *[R(F.corr("revenue", f"lag_{k}")).alias(f"acf_{k}") for k in _ACF_LAGS],
        F.count("lag_1").alias("n_pairs_1"),
    )
    trend = stats_linregress(spark, sf_dir)
    return trend.crossJoin(F.broadcast(acf)).select(
        "slope",
        "intercept",
        "r_value",
        "n_years",
        *[f"acf_{k}" for k in _ACF_LAGS],
        "n_pairs_1",
    )


# ---------------------------------------------------------------------------
# T4 — autocorrelation at lags 1..7 via shift+corr
# (reference pages/Oura_Investigation.py:309-323; significance band
# 1.96/sqrt(n) at :340).
# ---------------------------------------------------------------------------


@register(
    "stats_autocorr",
    extra=True,
    sql=f"""
    WITH daily AS ({_DAILY_SQL}),
    lagged AS (
      SELECT revenue,
             {', '.join(f'lag(revenue, {k}) OVER (ORDER BY order_date) AS lag_{k}' for k in _ACF_LAGS)}
      FROM daily)
    {' UNION ALL '.join(
        f'''SELECT {k} AS lag, round(corr(revenue, lag_{k}), {DP}) AS autocorr,
            count(lag_{k}) AS n_pairs FROM lagged'''
        for k in _ACF_LAGS)}
    ORDER BY lag
    """,
)
def stats_autocorr(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.orderBy("order_date")
    lagged = _daily(t).select(
        "revenue", *[F.lag("revenue", k).over(w).alias(f"lag_{k}") for k in _ACF_LAGS]
    )
    per_lag = [
        lagged.agg(
            F.lit(k).alias("lag"),
            R(F.corr("revenue", f"lag_{k}")).alias("autocorr"),
            F.count(f"lag_{k}").alias("n_pairs"),
        )
        for k in _ACF_LAGS
    ]
    out = per_lag[0]
    for df in per_lag[1:]:
        out = out.unionByName(df)
    return out.orderBy("lag")


# ---------------------------------------------------------------------------
# T1 — one-way ANOVA F statistic across groups, from group aggregates
# (reference pages/Oura_Investigation.py:90-93 stats.f_oneway by group).
# F = (SSB/(k-1)) / (SSW/(N-k)); both terms are sums over per-group stats,
# so the whole test is two aggregations — no collect.
# ---------------------------------------------------------------------------
@register(
    "stats_anova_f",
    extra=True,
    sql=f"""
    WITH g AS (
      SELECT o_orderpriority, count(*) AS n, avg(o_totalprice) AS mean,
             var_pop(o_totalprice) * count(*) AS ss_within
      FROM orders GROUP BY o_orderpriority),
    tot AS (
      SELECT sum(n * mean) / sum(n) AS grand_mean, sum(n) AS n_total,
             count(*) AS k FROM g)
    SELECT CAST(tot.k - 1 AS BIGINT) AS df_between,
           CAST(tot.n_total - tot.k AS BIGINT) AS df_within,
           round((sum(g.n * (g.mean - tot.grand_mean) ^ 2) / (tot.k - 1))
                 / (sum(g.ss_within) / (tot.n_total - tot.k)), {DP}) AS f_stat
    FROM g CROSS JOIN tot
    GROUP BY tot.k, tot.n_total
    """,
)
def stats_anova_f(spark, sf_dir):
    t = Tables(spark, sf_dir)
    g = t.orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.avg("o_totalprice").alias("mean"),
        (F.var_pop("o_totalprice") * F.count("*")).alias("ss_within"),
    )
    tot = g.agg(
        (F.sum(F.col("n") * F.col("mean")) / F.sum("n")).alias("grand_mean"),
        F.sum("n").alias("n_total"),
        F.count("*").alias("k"),
    )
    joined = g.crossJoin(F.broadcast(tot))
    sums = joined.groupBy("k", "n_total").agg(
        F.sum(F.col("n") * F.pow(F.col("mean") - F.col("grand_mean"), 2)).alias("ssb"),
        F.sum("ss_within").alias("ssw"),
    )
    return sums.select(
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n_total") - F.col("k")).cast("long").alias("df_within"),
        R(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("n_total") - F.col("k")))
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# T2 — Welch's t-test weekend vs weekday, from group aggregates
# (reference pages/Oura_Investigation.py:253-259).
# ---------------------------------------------------------------------------
@register(
    "stats_ttest_welch",
    extra=True,
    sql=f"""
    WITH grouped AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend' ELSE 'weekday' END AS grp,
             count(*) AS n, avg(value) AS mean, var_samp(value) AS var
      FROM events GROUP BY 1)
    SELECT round((max(CASE WHEN grp = 'weekend' THEN mean END)
                  - max(CASE WHEN grp = 'weekday' THEN mean END))
                 / sqrt(max(CASE WHEN grp = 'weekend' THEN var / n END)
                        + max(CASE WHEN grp = 'weekday' THEN var / n END)), {DP}) AS t_stat,
           max(CASE WHEN grp = 'weekend' THEN n END) AS n_weekend,
           max(CASE WHEN grp = 'weekday' THEN n END) AS n_weekday
    FROM grouped
    """,
)
def stats_ttest_welch(spark, sf_dir):
    t = Tables(spark, sf_dir)
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6=Saturday
    grp = F.when(F.dayofweek("ts").isin(1, 7), "weekend").otherwise("weekday")
    grouped = t.events.groupBy(grp.alias("grp")).agg(
        F.count("*").alias("n"), F.avg("value").alias("mean"), F.var_samp("value").alias("var")
    )
    we = lambda c: F.max(F.when(F.col("grp") == "weekend", c))  # noqa: E731
    wd = lambda c: F.max(F.when(F.col("grp") == "weekday", c))  # noqa: E731
    return grouped.agg(
        R(
            (we(F.col("mean")) - wd(F.col("mean")))
            / F.sqrt(we(F.col("var") / F.col("n")) + wd(F.col("var") / F.col("n")))
        ).alias("t_stat"),
        we(F.col("n")).alias("n_weekend"),
        wd(F.col("n")).alias("n_weekday"),
    )


# ---------------------------------------------------------------------------
# T3 — linear regression (slope/intercept/r) over yearly aggregates
# (reference pages/Oura_Investigation.py:220-221 stats.linregress).
# ---------------------------------------------------------------------------
@register(
    "stats_linregress",
    extra=True,
    sql=f"""
    WITH yearly AS (
      SELECT CAST(extract(year FROM o_orderdate) AS DOUBLE) AS yr,
             avg(o_totalprice) AS avg_revenue
      FROM orders GROUP BY 1)
    SELECT round(regr_slope(avg_revenue, yr), {DP})     AS slope,
           round(regr_intercept(avg_revenue, yr), {DP}) AS intercept,
           round(corr(avg_revenue, yr), {DP})           AS r_value,
           count(*) AS n_years
    FROM yearly
    """,
)
def stats_linregress(spark, sf_dir):
    t = Tables(spark, sf_dir)
    yearly = t.orders.groupBy(
        F.year("o_orderdate").cast("double").alias("yr")
    ).agg(F.avg("o_totalprice").alias("avg_revenue"))
    return yearly.agg(
        R(F.regr_slope("avg_revenue", "yr")).alias("slope"),
        R(F.regr_intercept("avg_revenue", "yr")).alias("intercept"),
        R(F.corr("avg_revenue", "yr")).alias("r_value"),
        F.count("*").alias("n_years"),
    )


# ---------------------------------------------------------------------------
# T5 — period-over-period change on a smoothed series (rolling mean then
# lag-k delta; reference pages/3_Oura_Wellness.py:232-290).
# ---------------------------------------------------------------------------
@register(
    "stats_period_over_period",
    sql=f"""
    WITH daily AS ({_DAILY_SQL}),
    smoothed AS (
      SELECT order_date,
             avg(revenue) OVER (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS smooth_rev
      FROM daily)
    SELECT CAST(date_trunc('month', order_date) AS DATE) AS month,
           round(avg(smooth_rev - prev_rev), {DP}) AS avg_pop_change
    FROM (SELECT order_date, smooth_rev,
                 lag(smooth_rev, 7) OVER (ORDER BY order_date) AS prev_rev
          FROM smoothed)
    WHERE prev_rev IS NOT NULL
    GROUP BY 1 ORDER BY month
    """,
)
def stats_period_over_period(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.orderBy("order_date")
    smoothed = _daily(t).select(
        "order_date", F.avg("revenue").over(w.rowsBetween(-6, 0)).alias("smooth_rev")
    )
    delta = smoothed.select(
        "order_date",
        "smooth_rev",
        F.lag("smooth_rev", 7).over(w).alias("prev_rev"),
    ).filter(F.col("prev_rev").isNotNull())
    return (
        delta.groupBy(F.date_trunc("month", "order_date").cast("date").alias("month"))
        .agg(R(F.avg(F.col("smooth_rev") - F.col("prev_rev"))).alias("avg_pop_change"))
        .orderBy("month")
    )
