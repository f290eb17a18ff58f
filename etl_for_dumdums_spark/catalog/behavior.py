"""Behavioral / event-history operators: funnel, cohort retention, SCD2.

The reference models user activity relationally (daily sleep/activity marts,
period-over-period comparisons — e.g. ``fct_daily_activity`` and the trends
marts, SURVEY.md §2.11); these queries are the standard event-analytics
shapes built the same Spark-first way over the ``events`` table:

  * ``events_funnel_steps``   — ordered multi-step conversion funnel;
  * ``events_cohort_retention`` — first-seen cohort × week-offset retention;
  * ``scd2_intervals``        — slowly-changing-dimension (Type 2) intervals
                                derived from a change-event stream, the
                                warehouse twin of the reference's MERGE
                                upsert history (lib/bigquery.py:128-224 keeps
                                only current rows; SCD2 keeps the history).

Scale notes (100 TB): every query shuffles the events table exactly once on
``user_id`` and then chains window/aggregate work inside that partitioning —
no per-user driver loops, no collect. Funnel step columns are chained
window minima (constant per user), so state per task is O(1) per row.
Cohort/SCD2 arithmetic is integer (dates / epoch micros) summed exactly and
divided once at the edge, so cross-engine hashes cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import ROUND_DP as DP
from . import Tables, register

R = lambda c: F.round(c, DP)  # noqa: E731


# ---------------------------------------------------------------------------
# Ordered conversion funnel: signup → view → click → purchase, each step
# strictly AFTER the previous step's first completion. Chained window minima
# over one user_id partitioning (one shuffle, four WindowExecs, no join).
# ---------------------------------------------------------------------------
@register(
    "events_funnel_steps",
    extra=True,
    sql=f"""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2 FROM s1),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3 FROM s2),
    s4 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
                  OVER (PARTITION BY user_id) AS t4 FROM s3),
    per_user AS (
      SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
      FROM s4 GROUP BY user_id)
    SELECT count(*) AS n_users,
           count(t1) AS n_signup,
           count(t2) AS n_signup_view,
           count(t3) AS n_signup_view_click,
           count(t4) AS n_full_funnel,
           round(count(t2) * 100.0 / nullif(count(t1), 0), {DP}) AS pct_s1_to_s2,
           round(count(t3) * 100.0 / nullif(count(t2), 0), {DP}) AS pct_s2_to_s3,
           round(count(t4) * 100.0 / nullif(count(t3), 0), {DP}) AS pct_s3_to_s4,
           round(count(t4) * 100.0 / nullif(count(t1), 0), {DP}) AS pct_overall
    FROM per_user
    """,
)
def events_funnel_steps(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id")
    ev = t.events.select("user_id", "ts", "event_type")
    s = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    s = s.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "view") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(w),
    )
    s = s.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t2")), F.col("ts"))
        ).over(w),
    )
    s = s.withColumn(
        "t4",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t3")), F.col("ts")
            )
        ).over(w),
    )
    per_user = s.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
        F.max("t4").alias("t4"),
    )
    c = lambda col: F.count(col)  # noqa: E731
    return per_user.agg(
        F.count("*").alias("n_users"),
        c("t1").alias("n_signup"),
        c("t2").alias("n_signup_view"),
        c("t3").alias("n_signup_view_click"),
        c("t4").alias("n_full_funnel"),
        R(c("t2") * 100.0 / F.nullif(c("t1"), F.lit(0))).alias("pct_s1_to_s2"),
        R(c("t3") * 100.0 / F.nullif(c("t2"), F.lit(0))).alias("pct_s2_to_s3"),
        R(c("t4") * 100.0 / F.nullif(c("t3"), F.lit(0))).alias("pct_s3_to_s4"),
        R(c("t4") * 100.0 / F.nullif(c("t1"), F.lit(0))).alias("pct_overall"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: cohort = ISO week of a user's first-seen day; a user
# counts as retained at week offset k if active on any day in [7k, 7k+7)
# days after their cohort day. date_trunc('week') is ISO-Monday in both
# engines; all arithmetic is integer date math.
# ---------------------------------------------------------------------------
@register(
    "events_cohort_retention",
    extra=True,
    sql=f"""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id),
    cohorts AS (
      SELECT user_id, cohort_day,
             CAST(date_trunc('week', cohort_day) AS DATE) AS cohort_week
      FROM firsts),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events),
    offsets AS (
      SELECT DISTINCT c.cohort_week, c.user_id,
             CAST(date_diff('day', c.cohort_day, a.active_day) // 7 AS BIGINT) AS week_offset
      FROM cohorts c JOIN activity a USING (user_id)),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY cohort_week)
    SELECT o.cohort_week, o.week_offset,
           count(*) AS n_active_users,
           s.cohort_size,
           round(count(*) * 100.0 / s.cohort_size, {DP}) AS retention_pct
    FROM offsets o JOIN sizes s USING (cohort_week)
    GROUP BY o.cohort_week, o.week_offset, s.cohort_size
    ORDER BY o.cohort_week, o.week_offset
    """,
)
def events_cohort_retention(spark, sf_dir):
    t = Tables(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    cohorts = firsts.withColumn(
        "cohort_week", F.date_trunc("week", F.col("cohort_day")).cast("date")
    )
    activity = t.events.select(
        "user_id", F.col("ts").cast("date").alias("active_day")
    ).distinct()
    offsets = (
        cohorts.join(activity, "user_id")
        .select(
            "cohort_week",
            "user_id",
            F.floor(F.datediff("active_day", "cohort_day") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        offsets.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active_users",
            "cohort_size",
            R(F.col("n_active_users") * 100.0 / F.col("cohort_size")).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# SCD Type-2 intervals from a change-event stream: collapse each user's
# consecutive same-type runs into [valid_from, valid_to) intervals; the open
# interval per user is current. Run detection = lag + running sum of change
# flags, all inside one user_id partitioning. Durations are exact epoch-
# micro integers summed before one edge division.
# ---------------------------------------------------------------------------
@register(
    "scd2_intervals",
    extra=True,
    sql=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    flagged AS (
      SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM ordered),
    runs AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    intervals AS (
      SELECT user_id, event_type, run_id,
             min(ts) AS valid_from, count(*) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id),
    closed AS (
      SELECT user_id, event_type, valid_from, n_events,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM intervals)
    SELECT event_type,
           count(*) AS n_intervals,
           count(valid_to) AS n_closed,
           count(*) - count(valid_to) AS n_current,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(sum(CASE WHEN valid_to IS NOT NULL
                          THEN epoch_us(valid_to) - epoch_us(valid_from)
                          ELSE 0 END) * 1.0
                 / (nullif(count(valid_to), 0) * 1000000), {DP})
             AS avg_closed_duration_sec
    FROM closed GROUP BY event_type ORDER BY event_type
    """,
)
def scd2_intervals(spark, sf_dir):
    from ..operators.scd import scd2_intervals_from_events

    t = Tables(spark, sf_dir)
    closed = scd2_intervals_from_events(
        t.events, "user_id", "ts", "event_type", "event_id"
    ).withColumnRenamed("attr", "event_type")
    # events.ts reads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
    # session-tz cast cancels in the subtraction, so durations are exact.
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    dur_us = F.when(F.col("valid_to").isNotNull(), us("valid_to") - us("valid_from")).otherwise(
        F.lit(0)
    )
    return (
        closed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.count("valid_to").alias("n_closed"),
            (F.count("*") - F.count("valid_to")).alias("n_current"),
            F.sum("n_events").alias("n_events"),
            R(
                F.sum(dur_us)
                * 1.0
                / (F.nullif(F.count("valid_to"), F.lit(0)) * 1000000)
            ).alias("avg_closed_duration_sec"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Event-type Markov transition matrix: per user, each event's successor type
# (lead over the same deterministic (ts, event_id) order SCD2 uses), then
# transition counts and per-from-state probabilities. One events shuffle on
# user_id; the count table is |types|² rows, so the probability join is a
# broadcast no-op at any corpus size.
# ---------------------------------------------------------------------------
@register(
    "events_markov_transitions",
    extra=True,
    sql=f"""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events),
    counts AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
    SELECT from_type, to_type, n_transitions,
           round(n_transitions * 1.0 /
                 sum(n_transitions) OVER (PARTITION BY from_type), {DP})
             AS p_transition
    FROM counts ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark, sf_dir):
    t = Tables(spark, sf_dir)
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(worder).alias("to_type"),
    )
    counts = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    wfrom = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        R(F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(wfrom)).alias(
            "p_transition"
        ),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# Trailing-7-day active users (WAU) per observed day, plus DAU and the
# DAU/WAU stickiness ratio. The reference's dashboards chart weekly
# aggregates (fct_hn_weekly_stats, SURVEY.md §2.5) but never a ROLLING
# distinct-user window — this is the standard product-analytics extension.
#
# Scale design (100 TB): rolling COUNT(DISTINCT) cannot ride an ordinary
# window frame (distinct isn't frame-decomposable). The scale-safe shape is
# the bounded contribution explode: each (user, day) pair contributes to
# exactly 7 trailing window days — a constant ×7 map-side fan-out, NOT a
# range self-join — then one hash aggregate per (window_day). Two shuffles
# total ((user, day) dedup; window_day agg), both on high-cardinality keys.
# The oracle states the same semantics as a range join, which is fine at
# oracle SF but would be O(days × users) at scale.
# ---------------------------------------------------------------------------
@register(
    "events_rolling_wau",
    extra=True,
    sql=f"""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    wau AS (
      SELECT d.day, count(DISTINCT ud.user_id) AS wau
      FROM days d JOIN ud ON ud.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
    SELECT d.day, dau.dau, wau.wau,
           round(dau.dau * 100.0 / wau.wau, {DP}) AS stickiness_pct
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    ORDER BY d.day
    """,
)
def events_rolling_wau(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ud = (
        t.events.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    days = ud.select("day").distinct()
    # bounded ×7 fan-out: (user, day) → the 7 window days it contributes to
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
    )
    wau = (
        contrib.join(days, "day")  # only emit observed days
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            R(F.col("dau") * 100.0 / F.col("wau")).alias("stickiness_pct"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Daily user accounting: active / new / returning users per day plus the
# cumulative registered-user curve. "New" = the user's first-ever event day
# (one min-aggregate per user — the cohort anchor events_cohort_retention
# already uses); cumulative = running sum of new users over the calendar.
#
# Scale design (100 TB): two hash shuffles (user_id for first-day; day for
# the daily rollup). The running sum's unpartitioned window is over ONE ROW
# PER CALENDAR DAY — the same "calendar-bounded window" class as
# stats_timeseries (docs/PLANS.md) — so its single-task sort is
# data-volume-independent.
# ---------------------------------------------------------------------------
@register(
    "events_daily_user_accounting",
    extra=True,
    sql="""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    first_seen AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
    daily AS (
      SELECT ud.day,
             count(*) AS active_users,
             CAST(count_if(f.first_day = ud.day) AS BIGINT) AS new_users
      FROM ud JOIN first_seen f ON ud.user_id = f.user_id
      GROUP BY ud.day)
    SELECT day, active_users, new_users,
           active_users - new_users AS returning_users,
           CAST(sum(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM daily ORDER BY day
    """,
)
def events_daily_user_accounting(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ud = (
        t.events.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        ud.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("active_users"),
            F.sum((F.col("first_day") == F.col("day")).cast("bigint")).alias(
                "new_users"
            ),
        )
    )
    wcum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(wcum).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Conversion latency: per user, the first 'view' and the first 'purchase'
# that FOLLOWS it; reports the viewer→converter funnel rate and the p50/p90
# time-to-convert. The lag is computed in exact epoch MICROSECONDS (BIGINT
# difference) and only converted to minutes at the rounded edge;
# percentiles use the interpolating percentile/quantile_cont pair whose
# cross-engine identity agg_global_summary already relies on.
#
# Scale design (100 TB): two shuffles, both on user_id — one aggregate for
# each user's first view, one for the first qualifying purchase (the filter
# `ts > first_view` is applied pre-aggregate after a broadcast-free
# user_id equi-join). The final percentile aggregate buffers one value per
# CONVERTED USER in a single task — bounded by the user population, and the
# documented exact-quantile scale path (operators/quantile.py's counting
# selection) applies when even that is too big.
# ---------------------------------------------------------------------------
@register(
    "events_conversion_lag",
    extra=True,
    sql=f"""
    WITH first_view AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    first_purchase AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN first_view v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
      GROUP BY e.user_id),
    lags AS (
      SELECT v.user_id,
             epoch_us(p.p_ts) - epoch_us(v.v_ts) AS lag_us
      FROM first_view v LEFT JOIN first_purchase p ON v.user_id = p.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_viewers,
           CAST(count(lag_us) AS BIGINT) AS n_converted,
           round(count(lag_us) * 100.0 / count(*), {DP}) AS conversion_pct,
           round(quantile_cont(lag_us, 0.5) / 60000000.0, {DP}) AS p50_lag_min,
           round(quantile_cont(lag_us, 0.9) / 60000000.0, {DP}) AS p90_lag_min
    FROM lags
    """,
)
def events_conversion_lag(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lags = first_view.join(first_purchase, "user_id", "left").select(
        "user_id",
        # events.ts reads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("v_ts").cast("timestamp"))
        ).alias("lag_us"),
    )
    return lags.agg(
        F.count("*").cast("bigint").alias("n_viewers"),
        F.count("lag_us").cast("bigint").alias("n_converted"),
        R(F.count("lag_us") * 100.0 / F.count("*")).alias("conversion_pct"),
        R(F.percentile("lag_us", F.lit(0.5)) / 60000000.0).alias("p50_lag_min"),
        R(F.percentile("lag_us", F.lit(0.9)) / 60000000.0).alias("p90_lag_min"),
    )


# ---------------------------------------------------------------------------
# Activity streaks (gaps-and-islands): consecutive-day runs per user, folded
# to the corpus-wide streak-length distribution. The island key is the
# classic date − row_number() anchor (two consecutive days share an anchor;
# a gap shifts it), so the whole operator is one user_id window plus two
# hash aggregates — all integer arithmetic.
#
# Scale design (100 TB): the window partitions by user_id over the DISTINCT
# (user, day) frame — per-partition size is bounded by the calendar span,
# not event volume (the dedup collapses raw events first). The distribution
# output is bounded by the longest streak.
# ---------------------------------------------------------------------------
@register(
    "events_activity_streaks",
    extra=True,
    sql="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    anchored AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS anchor
      FROM ud),
    streaks AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len
      FROM anchored GROUP BY user_id, anchor)
    SELECT streak_len,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM streaks GROUP BY streak_len ORDER BY streak_len
    """,
)
def events_activity_streaks(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ud = (
        t.events.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    anchored = ud.select(
        "user_id", "day", F.date_sub(F.col("day"), rn).alias("anchor")
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count("*").cast("bigint").alias("streak_len")
    )
    return (
        streaks.groupBy("streak_len")
        .agg(
            F.count("*").cast("bigint").alias("n_streaks"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("streak_len")
    )


# ---------------------------------------------------------------------------
# events_abtest_srm: A/B experiment readout with a sample-ratio-mismatch
# guard — the first two numbers any experimentation platform computes.
# Variant = user_id parity (deterministic hash split); exposure = any event;
# conversion = ≥1 purchase. The SRM chi-square against the designed 50/50
# split collapses algebraically to (2·n_A − T)² / T (both variants
# contribute the same squared deviation), kept in integer MILLIONTHS so no
# float crosses engines; srm_pass compares against the χ²(1df, 0.05)
# critical value 3.841459 in the same integer units. Conversion is integer
# ppm per variant.
# Scale: two distinct-user hash aggregates (one user_id shuffle each) over
# a 2-row output — nothing grows with events volume except the scans.
# ---------------------------------------------------------------------------
_SRM_CRIT_MILLIONTHS = 3_841_459  # χ²(1df) at p = 0.05


@register(
    "events_abtest_srm",
    extra=True,
    sql=f"""
    WITH exposed AS (
      SELECT DISTINCT user_id, user_id % 2 AS variant FROM events),
    converted AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    per_variant AS (
      SELECT e.variant,
             count(*) AS n_users,
             CAST(count(c.user_id) AS BIGINT) AS n_converted
      FROM exposed e LEFT JOIN converted c ON e.user_id = c.user_id
      GROUP BY e.variant),
    tot AS (
      SELECT *, sum(n_users) OVER () AS t_users FROM per_variant)
    SELECT CAST(variant AS BIGINT) AS variant, n_users, n_converted,
           CAST(n_converted * 1000000 // n_users AS BIGINT) AS conv_ppm,
           CAST((2 * n_users - t_users) * (2 * n_users - t_users) * 1000000
                // t_users AS BIGINT) AS srm_stat_millionths,
           ((2 * n_users - t_users) * (2 * n_users - t_users) * 1000000
                // t_users) < {_SRM_CRIT_MILLIONTHS} AS srm_pass
    FROM tot ORDER BY variant
    """,
)
def events_abtest_srm(spark, sf_dir):
    t = Tables(spark, sf_dir)
    exposed = t.events.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    converted = (
        t.events.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    per_variant = (
        exposed.join(converted.withColumn("_c", F.lit(1)), "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.count("_c").cast("long").alias("n_converted"),
        )
    )
    tot = per_variant.withColumn(
        "t_users", F.sum("n_users").over(W.partitionBy())
    )
    srm = F.expr("(2 * n_users - t_users) * (2 * n_users - t_users) * 1000000 DIV t_users")
    return tot.select(
        F.col("variant").cast("long").alias("variant"),
        "n_users",
        "n_converted",
        F.expr("CAST(n_converted * 1000000 DIV n_users AS BIGINT)").alias("conv_ppm"),
        srm.cast("long").alias("srm_stat_millionths"),
        (srm < _SRM_CRIT_MILLIONTHS).alias("srm_pass"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# Sequence-pattern mining over per-user event-type strings — the
# MATCH_RECOGNIZE stand-in: each user's first _SEQ_CAP events (ordered by
# ts, event_id — a total order) joined into a '>'-separated string, then
# adjacency patterns counted with non-overlapping regexp semantics and
# subsequence patterns tested as existence flags. Event-type names share no
# prefixes and contain no '>', so token-boundary ambiguity cannot occur;
# patterns are kept regex-trivial (literals + '.*') where RE2 (DuckDB) and
# Java regex (Spark) provably agree.
#
# Scale design (100 TB): the cap is applied BEFORE aggregation — a
# row_number() over (user_id ORDER BY ts, event_id) <= _SEQ_CAP pre-filter
# (sort-based WindowExec: spillable sort + a counter, O(1) running state)
# so collect_list only ever sees <= _SEQ_CAP rows per user. Per-user
# aggregation-buffer state is genuinely O(_SEQ_CAP), even for a bot user
# with millions of events (r3 verdict finding #1: the previous
# slice-after-collect_list shape materialized the full per-user list
# first). Both engines pre-filter identically (QUALIFY in the oracle), so
# the "first _SEQ_CAP events" semantic is unchanged. The pattern scans are
# map-side over one string per user; the final aggregate is one row.
# ---------------------------------------------------------------------------
_SEQ_CAP = 200
_SEQ_ADJ = [
    ("adj_click_purchase", "click>purchase"),
    ("adj_error_error", "error>error"),
]
_SEQ_SUB = [
    ("subseq_signup_purchase", "signup.*purchase"),
    ("subseq_view_click_purchase", "view.*click.*purchase"),
]

# event-type -> single-char token for the oracle's compact sequence form
# (see _sequence_pattern_sql). The char-form patterns are DERIVED from the
# same _SEQ_ADJ/_SEQ_SUB word patterns the Spark side scans, so editing the
# pattern constants cannot desync the two engines (r8 advice finding).
_SEQ_CHAR = {"click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v"}


def _seq_char_pattern(word_pattern: str) -> str:
    """'click>purchase' -> 'cp'; 'view.*click.*purchase' -> 'v.*c.*p'."""
    if ">" in word_pattern:
        return "".join(_SEQ_CHAR[w] for w in word_pattern.split(">"))
    return ".*".join(_SEQ_CHAR[w] for w in word_pattern.split(".*"))


def _sequence_pattern_sql(where: str = "") -> str:
    """Oracle SQL with an optional events WHERE clause — the input-sampled
    at-scale tier (catalog/sampled.py) restricts by user key; the per-user
    computation makes the restriction semantics-preserving."""
    # The oracle's per-user sequence is a SINGLE-CHAR string ('c','e','p',
    # 's','v' for the five event types), not the '>'-joined word string the
    # Spark side scans: DuckDB's per-group list/string aggregate state is
    # badly under-accounted, and the word form's ~10x larger strings pushed
    # RSS past the box at the 1000x replica (two OOM kills + one in-limit
    # OOM, r8 sweep). The four pattern counts are provably identical on the
    # char string: event types are atomic distinct tokens, so an adjacency
    # regex X>Y consumes exactly two tokens per non-overlapping match in
    # both forms (floor(run/2) for the self-adjacent 'ee'), and the
    # subsequence patterns are exists-in-order checks where .* spans the
    # same token gaps. Pin-tested against the word form in
    # tests/test_advice_r8.py.
    return f"""
    WITH firstk AS (
      SELECT user_id, ts, event_id,
             CASE event_type {' '.join(f"WHEN '{w}' THEN '{c}'" for w, c in sorted(_SEQ_CHAR.items()))}
                  ELSE 'x' END AS ch
      FROM events{where}
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              <= {_SEQ_CAP}),
    seqs AS (
      SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM firstk GROUP BY user_id),
    per AS (
      SELECT CAST(len(regexp_extract_all(seq, '{_seq_char_pattern(_SEQ_ADJ[0][1])}')) AS BIGINT) AS c1,
             CAST(len(regexp_extract_all(seq, '{_seq_char_pattern(_SEQ_ADJ[1][1])}')) AS BIGINT) AS c2,
             CASE WHEN regexp_matches(seq, '{_seq_char_pattern(_SEQ_SUB[0][1])}') THEN 1 ELSE 0 END AS f3,
             CASE WHEN regexp_matches(seq, '{_seq_char_pattern(_SEQ_SUB[1][1])}') THEN 1 ELSE 0 END AS f4
      FROM seqs),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(count_if(c1 > 0) AS BIGINT) AS u1, CAST(sum(c1) AS BIGINT) AS o1,
             CAST(count_if(c2 > 0) AS BIGINT) AS u2, CAST(sum(c2) AS BIGINT) AS o2,
             CAST(sum(f3) AS BIGINT) AS u3, CAST(sum(f4) AS BIGINT) AS u4
      FROM per)
    SELECT '{_SEQ_ADJ[0][0]}' AS pattern, u1 AS n_users_matched,
           CAST(u1 * 1000000 // n_users AS BIGINT) AS share_ppm,
           o1 AS n_occurrences FROM agg
    UNION ALL SELECT '{_SEQ_ADJ[1][0]}', u2,
           CAST(u2 * 1000000 // n_users AS BIGINT), o2 FROM agg
    UNION ALL SELECT '{_SEQ_SUB[0][0]}', u3,
           CAST(u3 * 1000000 // n_users AS BIGINT), CAST(NULL AS BIGINT) FROM agg
    UNION ALL SELECT '{_SEQ_SUB[1][0]}', u4,
           CAST(u4 * 1000000 // n_users AS BIGINT), CAST(NULL AS BIGINT) FROM agg
    ORDER BY pattern
    """


@register("events_sequence_pattern", extra=True, sql=_sequence_pattern_sql())
def events_sequence_pattern(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return _sequence_pattern(t.events)


def _sequence_pattern(events):
    firstk = (
        events.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("_rn") <= _SEQ_CAP)
        .drop("_rn")
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    seqs = firstk.groupBy("user_id").agg(seq.alias("seq"))
    per = seqs.select(
        F.regexp_count("seq", F.lit(_SEQ_ADJ[0][1])).cast("long").alias("c1"),
        F.regexp_count("seq", F.lit(_SEQ_ADJ[1][1])).cast("long").alias("c2"),
        F.when(F.col("seq").rlike(_SEQ_SUB[0][1]), 1).otherwise(0).alias("f3"),
        F.when(F.col("seq").rlike(_SEQ_SUB[1][1]), 1).otherwise(0).alias("f4"),
    )
    agg = per.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count_if(F.col("c1") > 0).cast("long").alias("u1"),
        F.sum("c1").cast("long").alias("o1"),
        F.count_if(F.col("c2") > 0).cast("long").alias("u2"),
        F.sum("c2").cast("long").alias("o2"),
        F.sum("f3").cast("long").alias("u3"),
        F.sum("f4").cast("long").alias("u4"),
    )
    # ONE pipeline, four output rows: the single-row aggregate explodes into
    # the per-pattern rows. (The previous union-of-4-selects shape re-executed
    # the whole scan→sort→window→collect_list→agg pipeline once PER pattern —
    # 4 full passes over events, the round-5 1000x probe's top cost.)
    share = lambda u: F.expr(f"CAST({u} * 1000000 div n_users AS BIGINT)")  # noqa: E731
    null_long = F.lit(None).cast("long")
    row = lambda name, u, o: F.struct(  # noqa: E731
        F.lit(name).alias("pattern"),
        F.col(u).alias("n_users_matched"),
        share(u).alias("share_ppm"),
        o.alias("n_occurrences"),
    )
    return (
        agg.select(
            F.explode(
                F.array(
                    row(_SEQ_ADJ[0][0], "u1", F.col("o1")),
                    row(_SEQ_ADJ[1][0], "u2", F.col("o2")),
                    row(_SEQ_SUB[0][0], "u3", null_long),
                    row(_SEQ_SUB[1][0], "u4", null_long),
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("pattern")
    )


# ---------------------------------------------------------------------------
# Native session windows: Spark's built-in session_window() operator (the
# merge-while-within-gap semantic: a session extends while the next event is
# strictly less than the gap after the previous; diff >= gap breaks). The
# oracle states the identical rule as lag/epoch-micro islanding. This is the
# NATIVE-operator twin of win_sessionize (which demonstrates the manual
# window-arithmetic construction with a '>' gap rule); the streaming side of
# session_window is exercised in tests/test_streaming.py with a watermark.
#
# Scale design (100 TB): session_window is one user_id shuffle with
# sort-merge session assembly inside each task (no per-user state beyond the
# open session); the per-session frame aggregates away before the single-row
# summary. All durations are exact epoch-micro integers divided once.
# ---------------------------------------------------------------------------
_SESS_GAP_MIN = 30
_SESS_GAP_US = _SESS_GAP_MIN * 60 * 1_000_000


@register(
    "events_session_native",
    extra=True,
    sql=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
      FROM events),
    marked AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us >= {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM ordered),
    sess AS (
      SELECT user_id, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    per AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n,
             CAST(max(us) - min(us) AS BIGINT) AS dur_us
      FROM sess GROUP BY user_id, sid)
    SELECT CAST(count(*) AS BIGINT)                 AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT)  AS n_users,
           CAST(count_if(n = 1) AS BIGINT)          AS n_single_event,
           CAST(max(n) AS BIGINT)                   AS max_events,
           round(sum(n) * 1.0 / count(*), {DP})     AS avg_events,
           round(sum(dur_us) / (count(*) * 1000000.0), {DP}) AS avg_duration_sec,
           round(max(dur_us) / 1000000.0, {DP})     AS max_duration_sec
    FROM per
    """,
)
def events_session_native(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    per = (
        ev.groupBy("user_id", F.session_window("ts", f"{_SESS_GAP_MIN} minutes"))
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("long")
            .alias("dur_us"),
        )
    )
    return per.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count_if(F.col("n") == 1).cast("long").alias("n_single_event"),
        F.max("n").cast("long").alias("max_events"),
        F.round(F.sum("n") * 1.0 / F.count("*"), DP).alias("avg_events"),
        F.round(F.sum("dur_us") / (F.count("*") * 1000000.0), DP).alias(
            "avg_duration_sec"
        ),
        F.round(F.max("dur_us") / 1000000.0, DP).alias("max_duration_sec"),
    )


# ---------------------------------------------------------------------------
# Weekly activity bitmaps: each (user, week) collapses to ONE integer whose
# bit i says "active on weekday i" (bit_or of 1 << day-in-week), and the
# corpus rolls up by bit_count — the roaring-bitmap-style engagement-pattern
# census (how many user-weeks are 1-day vs 7-day actives, and how diverse
# the day patterns are at each activity level). Day indexing is engine-
# neutral epoch-day arithmetic from a fixed anchor Monday, not locale
# dayofweek.
#
# Scale design (100 TB): distinct (user, week, daybit) collapses first, the
# bitmap is a bit_or hash aggregate on (user, week), the histogram an 8-key
# rollup — three shuffles, each strictly smaller than the last; bitmaps
# replace a 7-row-per-user-week frame with one BIGINT.
# ---------------------------------------------------------------------------
_BITMAP_ANCHOR = "2024-01-01"  # a Monday


@register(
    "events_activity_bitmap",
    extra=True,
    sql=f"""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{_BITMAP_ANCHOR}', CAST(ts AS DATE)) AS di
      FROM events
      WHERE CAST(ts AS DATE) >= DATE '{_BITMAP_ANCHOR}'),
    weekly AS (
      SELECT user_id, di // 7 AS week,
             CAST(bit_or(1 << CAST(di % 7 AS INT)) AS BIGINT) AS bitmap
      FROM days GROUP BY 1, 2),
    counted AS (
      SELECT week, bitmap, CAST(bit_count(bitmap) AS BIGINT) AS days_active
      FROM weekly)
    SELECT days_active,
           CAST(count(*) AS BIGINT) AS n_user_weeks,
           CAST(count(DISTINCT bitmap) AS BIGINT) AS n_patterns,
           CAST(max(bitmap) AS BIGINT) AS max_pattern
    FROM counted GROUP BY days_active ORDER BY days_active
    """,
)
def events_activity_bitmap(spark, sf_dir):
    t = Tables(spark, sf_dir)
    days = (
        t.events.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit(_BITMAP_ANCHOR).cast("date")
            ).alias("di"),
        )
        .filter(F.col("di") >= 0)
        .distinct()
    )
    weekly = (
        days.groupBy("user_id", F.expr("di div 7").alias("week"))
        .agg(
            F.expr("CAST(bit_or(shiftleft(1, CAST(di % 7 AS INT))) AS BIGINT)").alias(
                "bitmap"
            )
        )
    )
    counted = weekly.select(
        "week", "bitmap", F.bit_count("bitmap").cast("long").alias("days_active")
    )
    return (
        counted.groupBy("days_active")
        .agg(
            F.count("*").cast("long").alias("n_user_weeks"),
            F.count_distinct("bitmap").cast("long").alias("n_patterns"),
            F.max("bitmap").cast("long").alias("max_pattern"),
        )
        .orderBy("days_active")
    )
