"""Per-group model fitting via groupBy().applyInPandas — the grouped-map
Pandas API (reference notebooks fit per-slice regressions in pandas after
collecting; here the fit runs distributed, one Arrow batch per group).

Two rules keep this the FAST Python path rather than the slow one:
  * closed-form OLS (numpy dot products), no per-row Python;
  * the group key is the shuffle key, so each fit sees exactly its group's
    rows once — state per task is one group's daily vector, never the table.

``fit_user_trends`` has a native-DataFrame twin (``user_trends_native``,
covariance-formula slope entirely in JVM expressions) pinned equal by test —
the demonstration that the Python surface is a convenience, not a semantic
fork. Prefer the native twin in 100 TB pipelines; reach for applyInPandas
only when the per-group model has no closed column-expression form.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIT_SCHEMA = (
    "user_id long, n_days long, slope double, intercept double, mean_daily double"
)


def _daily_counts(events: DataFrame) -> DataFrame:
    return (
        events.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.datediff("day", F.lit("2024-01-01")).cast("double").alias("x"),
            F.col("n_events").cast("double").alias("y"),
        )
    )


def fit_user_trends(events: DataFrame) -> DataFrame:
    """Per-user OLS trend of daily event counts, one applyInPandas fit per
    user group (closed-form: slope = cov(x,y)/var(x))."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
        n = len(x)
        mx, my = x.mean(), y.mean()
        varx = ((x - mx) ** 2).mean()
        slope = float(((x - mx) * (y - my)).mean() / varx) if varx > 0 else 0.0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_days": [n],
                "slope": [slope],
                "intercept": [float(my - slope * mx)],
                "mean_daily": [float(my)],
            }
        )

    return _daily_counts(events).groupBy("user_id").applyInPandas(fit, _FIT_SCHEMA)


def user_trends_native(events: DataFrame) -> DataFrame:
    """JVM-native twin: the same OLS via covar_pop/var_pop aggregates."""
    daily = _daily_counts(events)
    slope = F.when(
        F.var_pop("x") > 0, F.covar_pop("x", "y") / F.var_pop("x")
    ).otherwise(F.lit(0.0))
    return (
        daily.groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            slope.alias("slope"),
            (F.avg("y") - slope * F.avg("x")).alias("intercept"),
            F.avg("y").alias("mean_daily"),
        )
        .select("user_id", "n_days", "slope", "intercept", "mean_daily")
    )


# ---------------------------------------------------------------------------
# GROUPED_AGG pandas_udf — the third Arrow-Python flavor (after grouped-map
# applyInPandas above and the scalar pandas_udf token counter): a custom
# aggregate usable inside groupBy().agg() alongside built-ins. Arrow ships
# each group's column as one pandas Series; still the slow path vs JVM
# aggregates, so the native twin below is the production plan and the UDF
# is the escape hatch for aggregates SQL can't express.
# ---------------------------------------------------------------------------
_TRIM_FRAC = 0.1


def trimmed_mean_grouped_udf(events: DataFrame) -> DataFrame:
    """Per-event-type 10%-trimmed mean of `value` via a grouped-agg
    pandas_udf (drop the k=floor(n*frac) lowest and highest values)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values()
        k = int(len(s) * _TRIM_FRAC)
        kept = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
        return float(kept.mean())

    return (
        events.groupBy("event_type")
        .agg(trimmed_mean("value").alias("trimmed_mean_value"))
        .orderBy("event_type")
    )


def trimmed_mean_native(events: DataFrame) -> DataFrame:
    """JVM-native twin: rank per group, drop the k extremes, avg the rest.
    Trimming is by rank, and rank ties can only occur between EQUAL values,
    so which copy gets dropped cannot change the mean — the two paths agree
    exactly (up to float summation order)."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value")
    ranked = events.select("event_type", "value").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
    k = F.floor(F.col("n") * _TRIM_FRAC)
    kept = ranked.filter(
        (F.col("n") <= 2 * k) | ((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    )
    return (
        kept.groupBy("event_type")
        .agg(F.avg("value").alias("trimmed_mean_value"))
        .orderBy("event_type")
    )
