"""Time-series gap-fill and interpolation (beyond-reference).

The reference's dashboards plot daily series straight from marts and
simply show holes (e.g. pages/3_Oura_Wellness.py rolling means with
min_periods=1); a real analytics engine needs an explicit densify +
interpolate operator. This one builds a calendar spine per group with
`sequence`/`explode` (generated distributed, no driver loop), left-joins
the observed points, and fills gaps by linear interpolation between the
nearest observed neighbors (LOCF/NOCB at the edges) using
ignore-nulls window frames.

Determinism: daily revenue is summed in exact integer cents (the repo's
standard exact-rounding trick, tests/test_exact_rounding.py), so the only
float steps are the final interpolation ratio and /100 rescale — both
single IEEE ops on identical operands in both engines.

Scale design (100 TB): the spine is |groups| × |days| rows generated
map-side; the interpolation windows partition by group and are bounded by
the calendar (365 rows per partition regardless of data volume — the same
"calendar-bounded window" class as stats_timeseries, docs/PLANS.md). The
observed-points join shuffles on (group, day) — the natural key. No
driver-side loops, no unbounded windows over data-sized partitions.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import ROUND_DP as DP
from . import Tables, register

_Y0, _Y1 = "1995-01-01", "1995-12-31"


@register(
    "ts_gapfill_interpolate",
    sql=f"""
    WITH daily AS (
      SELECT r.r_name AS region, CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{_Y0}' AND DATE '{_Y1}'
      GROUP BY r.r_name, CAST(o_orderdate AS DATE)),
    spine AS (
      SELECT r.r_name AS region, CAST(gs.d AS DATE) AS day
      FROM region r
      CROSS JOIN (SELECT unnest(generate_series(DATE '{_Y0}', DATE '{_Y1}', INTERVAL 1 DAY)) AS d) gs),
    joined AS (
      SELECT s.region, s.day, d.n_orders, d.rev_cents
      FROM spine s LEFT JOIN daily d ON s.region = d.region AND s.day = d.day),
    anchored AS (
      SELECT region, day, n_orders, rev_cents,
             last_value(rev_cents IGNORE NULLS) OVER (
               PARTITION BY region ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             last_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY region ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
             first_value(rev_cents IGNORE NULLS) OVER (
               PARTITION BY region ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY region ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM joined)
    SELECT region, day,
           coalesce(n_orders, 0) AS n_orders,
           CASE WHEN rev_cents IS NOT NULL THEN 0 ELSE 1 END AS is_gap,
           CASE
             WHEN rev_cents IS NOT NULL THEN round(rev_cents / 100.0, {DP})
             WHEN prev_v IS NULL THEN round(next_v / 100.0, {DP})
             WHEN next_v IS NULL THEN round(prev_v / 100.0, {DP})
             -- exact half-away rounding of the rational lerp to 1e-4
             -- dollars: T = floor((2N + dn) / (2 dn)) with integer
             -- N = 100*(prev*dn + (next-prev)*dd); no float ties possible
             ELSE (2 * 100 * (prev_v * date_diff('day', prev_d, next_d)
                              + (next_v - prev_v) * date_diff('day', prev_d, day))
                   + date_diff('day', prev_d, next_d))
                  // (2 * date_diff('day', prev_d, next_d)) / 10000.0
           END AS revenue_filled
    FROM anchored
    ORDER BY region, day
    """,
    extra=True,
)
def ts_gapfill_interpolate(spark, sf_dir):
    """Densify 1995 per-region daily revenue and linearly interpolate gaps."""
    t = Tables(spark, sf_dir)
    daily = (
        t.orders.select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("day"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .filter(F.col("day").between(_Y0, _Y1))
        .join(t.customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region.select("r_regionkey", F.col("r_name").alias("region"))), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("region", "day")
        .agg(F.count("*").alias("n_orders"), F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    spine = t.region.select(F.col("r_name").alias("region")).crossJoin(
        F.broadcast(
            t.region.sparkSession.range(1).select(
                F.explode(
                    F.expr(f"sequence(to_date('{_Y0}'), to_date('{_Y1}'), interval 1 day)")
                ).alias("day")
            )
        )
    )
    joined = spine.join(daily, ["region", "day"], "left")
    asc = W.partitionBy("region").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    desc = W.partitionBy("region").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    obs_day = F.when(F.col("rev_cents").isNotNull(), F.col("day"))
    anchored = joined.select(
        "region",
        "day",
        "n_orders",
        "rev_cents",
        F.last("rev_cents", ignorenulls=True).over(asc).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(asc).alias("prev_d"),
        F.first("rev_cents", ignorenulls=True).over(desc).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(desc).alias("next_d"),
    )
    # exact half-away rounding of the rational lerp to 1e-4 dollars via the
    # floor-division identity (see tests/test_exact_rounding.py): no float
    # ties, so both engines agree bit-for-bit
    lerp_exact = F.expr(
        "(2 * 100 * (prev_v * CAST(datediff(next_d, prev_d) AS BIGINT)"
        "            + (next_v - prev_v) * CAST(datediff(day, prev_d) AS BIGINT))"
        " + CAST(datediff(next_d, prev_d) AS BIGINT))"
        " DIV (2 * CAST(datediff(next_d, prev_d) AS BIGINT)) / 10000.0"
    )
    return anchored.select(
        "region",
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("rev_cents").isNotNull(), 0).otherwise(1).alias("is_gap"),
        F.when(F.col("rev_cents").isNotNull(), F.round(F.col("rev_cents") / 100.0, DP))
        .when(F.col("prev_v").isNull(), F.round(F.col("next_v") / 100.0, DP))
        .when(F.col("next_v").isNull(), F.round(F.col("prev_v") / 100.0, DP))
        .otherwise(lerp_exact)
        .alias("revenue_filled"),
    ).orderBy("region", "day")


# ---------------------------------------------------------------------------
# OHLC downsampling: the stocks-page resample (reference pages/2_Stock_
# Market.py charts daily closes; sources/stocks.py ships raw OHLC rows)
# generalized to any (series, time-bucket) grid — open/high/low/close of
# `value` per (event_type, week) plus the week-over-week close delta.
#
# Determinism: open/close are exact row picks via lexicographic struct
# min/max on (ts, value) — ties on ts resolve to the smaller value in BOTH
# engines, no arg_min tie ambiguity. high/low/close-delta are exact; only
# avg is rounded. Scale design (100 TB): one shuffle (groupBy the composite
# key, map-side partial min/max structs); the close-delta window partitions
# by event_type over calendar-bounded weekly rows — the same
# "calendar-bounded window" class as stats_timeseries (docs/PLANS.md).
# ---------------------------------------------------------------------------
@register(
    "ts_resample_ohlc",
    extra=True,
    sql=f"""
    WITH ohlc AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS DATE) AS week,
             count(*) AS n_events,
             (min({{'ts': ts, 'v': value}}))['v'] AS open,
             max(value) AS high,
             min(value) AS low,
             (max({{'ts': ts, 'v': value}}))['v'] AS close,
             (CASE WHEN sum(CAST(round(value * 100) AS BIGINT)) >= 0 THEN 1 ELSE -1 END
              * ((200 * abs(sum(CAST(round(value * 100) AS BIGINT))) + count(*))
                 // (2 * count(*)))) / 10000.0 AS avg_value
      FROM events GROUP BY 1, 2)
    SELECT event_type, week, n_events, open, high, low, close, avg_value,
           close - lag(close) OVER (PARTITION BY event_type ORDER BY week)
             AS close_delta_wow
    FROM ohlc ORDER BY event_type, week
    """,
)
def ts_resample_ohlc(spark, sf_dir):
    """Weekly OHLC bars per event_type with week-over-week close delta;
    open/close picked by exact (ts, value) struct extremes."""
    from ..functions import week_start

    t = Tables(spark, sf_dir)
    ohlc = (
        t.events.groupBy(
            "event_type", week_start(F.col("ts")).alias("week")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.struct("ts", "value"))["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("ts", "value"))["value"].alias("close"),
            # exact integer-cents mean via the signed half-away floor-division
            # identity (tests/test_exact_rounding.py): no double round() near
            # a representability boundary, both engines agree bit-for-bit
            (
                F.when(F.sum(F.round(F.col("value") * 100).cast("long")) >= 0, 1)
                .otherwise(-1)
                .cast("long")
                * F.expr(
                    "(200 * abs(sum(CAST(round(value * 100) AS BIGINT))) + count(*))"
                    " DIV (2 * count(*))"
                )
                / F.lit(10000.0)
            ).alias("avg_value"),
        )
    )
    w = W.partitionBy("event_type").orderBy("week")
    return ohlc.select(
        "event_type",
        "week",
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "avg_value",
        (F.col("close") - F.lag("close").over(w)).alias("close_delta_wow"),
    ).orderBy("event_type", "week")


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection over daily event counts per event_type.
# The trailing-14-day window EXCLUDES the current day (rows -14..-1) so a
# spike can't suppress its own baseline. The anomaly flag is decided in
# EXACT integer arithmetic: with n window days, S = Σc, Q = Σc², the test
# |z| > 3 is equivalent to (c·n − S)²·(n−1) > 9·n·(n·Q − S²) — pure BIGINT
# cross-multiplication, no float threshold to diverge cross-engine. The
# reported z itself is the usual rounded double (identical expression tree
# in both engines: one divide inside one sqrt, then one divide).
#
# Scale design (100 TB): the windows partition by event_type over ONE ROW
# PER (type, day) — calendar-bounded partitions (docs/PLANS.md class), so
# the sort inside each window task is data-volume-independent; the only
# data-sized work is the first daily-count hash aggregate. Overflow bound:
# with daily counts up to ~2^31, (c·n−S)² stays under 2^63 for n ≤ 14 only
# if c ≲ 3·10^8 per (type, day) — beyond that, pre-scale counts to
# thousands before the window (the flag is scale-invariant in c).
# ---------------------------------------------------------------------------
@register(
    "ts_anomaly_zscore",
    extra=True,
    sql=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    win AS (
      SELECT event_type, day, c,
             count(c) OVER w AS n,
             sum(c)   OVER w AS s,
             sum(c * c) OVER w AS q
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, c AS n_events,
           CASE WHEN n >= 7 AND n * q - s * s > 0
                THEN round((c * n - s) / sqrt(n * 1.0 * (n * q - s * s) / (n - 1)), {DP})
           END AS z,
           CASE WHEN n >= 7 AND n * q - s * s > 0
                     AND (c * n - s) * (c * n - s) * (n - 1) > 9 * n * (n * q - s * s)
                THEN CASE WHEN c * n - s > 0 THEN 1 ELSE -1 END
                ELSE 0 END AS anomaly_sign
    FROM win ORDER BY event_type, day
    """,
)
def ts_anomaly_zscore(spark, sf_dir):
    t = Tables(spark, sf_dir)
    daily = (
        t.events.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-14, -1)
    win = daily.select(
        "event_type",
        "day",
        "c",
        F.count("c").over(w).alias("n"),
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("q"),
    )
    n, s, q, c = F.col("n"), F.col("s"), F.col("q"), F.col("c")
    varnum = n * q - s * s  # n(n-1) × sample variance, exact BIGINT
    dev = c * n - s  # n × (c − mean), exact BIGINT
    ok = (n >= 7) & (varnum > 0)
    return win.select(
        "event_type",
        "day",
        c.alias("n_events"),
        F.when(ok, F.round(dev / F.sqrt(n * 1.0 * varnum / (n - 1)), DP)).alias("z"),
        F.when(
            ok & (dev * dev * (n - 1) > 9 * n * varnum),
            F.when(dev > 0, 1).otherwise(-1),
        )
        .otherwise(0)
        .alias("anomaly_sign"),
    ).orderBy("event_type", "day")
