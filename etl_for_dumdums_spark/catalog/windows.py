"""Window-function operators (SURVEY.md §2.6 W1-W11, §2.7, F8, R5/R6).

Every window carries a deterministic total ordering (unique tie-break key)
so rank-based picks are stable across engines. At scale these are single
shuffles on the partition key; the daily-series windows first reduce to one
row per (key, day) — the window then runs over a tiny aggregate, never the
raw fact table.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import ROUND_DP as DP
from . import Tables, register

R = lambda c: F.round(c, DP)  # noqa: E731


# ---------------------------------------------------------------------------
# W1/W2/W5 — the three row_number pick patterns in ONE query, as columns from
# three window specs over the same scan: latest-per-(user,type) dedup (W1,
# reference stg_hn__comments.sql:6-11), best-record with CASE order (W2,
# stg_fda__food_events.sql:18-29), latest-per-user recency pick (W5,
# fct_stock_prices.sql:81-84). Merged from r01 win_dedup_latest /
# win_best_record_case_order / win_recency_latest (kept below as extras).
# Value sums go through integer cents so summation order can't flip the hash.
# ---------------------------------------------------------------------------
@register(
    "win_pick_per_group",
    sql=f"""
    WITH ranked AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_user,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CASE WHEN event_type = 'purchase' THEN 0
                             WHEN event_type = 'signup'   THEN 1
                             ELSE 2 END, ts DESC, event_id DESC) AS rn_best
      FROM events)
    SELECT user_id,
           max(CASE WHEN rn_user = 1 THEN event_type END) AS last_event_type,
           round(max(CASE WHEN rn_user = 1 THEN value END), {DP}) AS last_value,
           max(CASE WHEN rn_best = 1 THEN event_type END) AS best_event_type,
           CAST(count_if(rn_type = 1) AS BIGINT) AS n_event_types,
           round(sum(CASE WHEN rn_type = 1
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) / 100.0, {DP})
             AS sum_latest_value
    FROM ranked GROUP BY user_id ORDER BY user_id
    """,
)
def win_pick_per_group(spark, sf_dir):
    t = Tables(spark, sf_dir)
    pref = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(2)
    )
    recency = [F.col("ts").desc(), F.col("event_id").desc()]
    ranked = t.events.select(
        "user_id",
        "event_type",
        "value",
        F.row_number().over(W.partitionBy("user_id", "event_type").orderBy(*recency)).alias("rn_type"),
        F.row_number().over(W.partitionBy("user_id").orderBy(*recency)).alias("rn_user"),
        F.row_number().over(W.partitionBy("user_id").orderBy(pref, *recency)).alias("rn_best"),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ranked.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn_user") == 1, F.col("event_type"))).alias("last_event_type"),
            R(F.max(F.when(F.col("rn_user") == 1, F.col("value")))).alias("last_value"),
            F.max(F.when(F.col("rn_best") == 1, F.col("event_type"))).alias("best_event_type"),
            F.count_if(F.col("rn_type") == 1).alias("n_event_types"),
            R(
                F.sum(F.when(F.col("rn_type") == 1, cents).otherwise(F.lit(0))) / 100.0
            ).alias("sum_latest_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# W1/W2 — row_number dedup keeping the latest record
# (reference stg_hn__comments.sql:6-11, stg_oura__daily_activity.sql:7-11).
# ---------------------------------------------------------------------------
@register(
    "win_dedup_latest",
    extra=True,
    sql=f"""
    WITH ranked AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT event_type, count(*) AS n_user_types, round(sum(value), {DP}) AS sum_latest_value
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
)
def win_dedup_latest(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_user_types"), R(F.sum("value")).alias("sum_latest_value"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# W3/W4/F8 — top-N-per-group via rank filter (QUALIFY idiom)
# (reference fct_sales_by_county.sql:35-50, sources/hacker_news.py:306-325)
# + A13 group-total transform: each row's share of its partition total
# (reference pages/9_FDA_Food_Events.py:346; merged from r01 win_group_share,
# kept below as an extra). Totals are summed in integer cents so summation
# order can't flip the hash. The oracle SQL is the simple one-window QUALIFY
# form; the Spark plan is the scalable salted two-stage equivalent (see the
# function body) because the partition key has only 5 distinct values.
# ---------------------------------------------------------------------------
@register(
    "win_top_n_per_group",
    sql=f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_priority,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_orderpriority) AS priority_cents
      FROM orders)
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total_price, rank_in_priority,
           round(100.0 * CAST(round(o_totalprice * 100) AS BIGINT) / priority_cents, {DP})
             AS share_of_priority_pct
    FROM ranked WHERE rank_in_priority <= 3
    ORDER BY o_orderpriority, rank_in_priority
    """,
)
def win_top_n_per_group(spark, sf_dir):
    # Scalable top-N, engine-native: Spark's RankLimit rule compiles a
    # row_number rank filter into WindowGroupLimit(Partial) BEFORE the
    # exchange — every map task locally prunes to <= N rows per group, so
    # the shuffle carries <= tasks*groups*N rows and the final per-group
    # sort sees <= tasks*N rows, never |orders|/5. Plan-pinned in
    # tests/test_plans.py. (r1-r3 hand-built the same bound with a salted
    # two-stage window; the optimizer's rewrite measured equal-or-faster at
    # 600M rows — 19.6 s vs 22.1 s — so the hand-scheduling is retired.)
    # The share column's partition totals come from a map-side-combined
    # aggregation (5 rows) broadcast back — never from an unbounded
    # partition window over the fact table.
    t = Tables(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    orders = t.orders.withColumn("cents", cents)
    totals = orders.groupBy("o_orderpriority").agg(F.sum("cents").alias("priority_cents"))
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    global_w = W.partitionBy("o_orderpriority").orderBy(*order_cols)
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(global_w))
        .filter(F.col("rank_in_priority") <= 3)
        .join(F.broadcast(totals), "o_orderpriority")
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rank_in_priority",
            R(F.lit(100.0) * F.col("cents") / F.col("priority_cents")).alias(
                "share_of_priority_pct"
            ),
        )
        .orderBy("o_orderpriority", "rank_in_priority")
    )


# ---------------------------------------------------------------------------
# W5 — recency rank consumed as rank = 1 (latest record per key)
# (reference fct_stock_prices.sql:81-84, Summary.py:124).
# ---------------------------------------------------------------------------
@register(
    "win_recency_latest",
    extra=True,
    sql=f"""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS recency_rank
      FROM events)
    SELECT user_id, event_type AS last_event_type, round(value, {DP}) AS last_value
    FROM ranked WHERE recency_rank = 1
    ORDER BY user_id
    """,
)
def win_recency_latest(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        t.events.withColumn("recency_rank", F.row_number().over(w))
        .filter(F.col("recency_rank") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            R(F.col("value")).alias("last_value"),
        )
        .orderBy("user_id")
    )


def _daily_revenue(t):
    """One row per (priority, day): the pre-aggregation that keeps all
    following window ops on a tiny series regardless of fact-table SF."""
    return t.orders.groupBy(
        "o_orderpriority", F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))


_DAILY_SQL = """
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS order_date,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# W6/W7 — lag-1 and lag-k deltas (day-over-day / week-over-week)
# (reference fct_stock_prices.sql:31-34, fct_keyword_trends.sql:37-46).
# ---------------------------------------------------------------------------
@register(
    "win_lag_deltas",
    sql=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT o_orderpriority, order_date, revenue,
           round(revenue - lag(revenue, 1) OVER w, {DP}) AS dod_change,
           round(revenue - lag(revenue, 7) OVER w, {DP}) AS wow_change
    FROM daily
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_date)
    ORDER BY o_orderpriority, order_date
    """,
)
def win_lag_deltas(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("order_date")
    daily = _daily_revenue(t)
    rev = F.col("revenue")
    return daily.select(
        "o_orderpriority",
        "order_date",
        "revenue",
        R(rev - F.lag(rev, 1).over(w)).alias("dod_change"),
        R(rev - F.lag(rev, 7).over(w)).alias("wow_change"),
    ).orderBy("o_orderpriority", "order_date")


# ---------------------------------------------------------------------------
# W8/W9/W11 — trailing rolling mean/max/min frames + derived signals
# (reference fct_stock_prices.sql:37-78,96-129: 7d/30d MA, 52-week range)
# + W10 centered ±3-row peak flag (reference fct_keyword_trends.sql:49-57;
# merged from r01 win_centered_peak, kept below as an extra). All frames are
# columns of one window spec over the same pre-aggregated daily series.
# ---------------------------------------------------------------------------
@register(
    "win_rolling_frames",
    sql=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT o_orderpriority, order_date, revenue,
           round(avg(revenue) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), {DP})  AS ma_7,
           round(avg(revenue) OVER (w ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), {DP}) AS ma_30,
           round(max(revenue) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW), {DP}) AS high_252,
           round(min(revenue) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW), {DP}) AS low_252,
           CASE WHEN avg(revenue) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                     > avg(revenue) OVER (w ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
                THEN 'uptrend' ELSE 'downtrend' END AS ma_trend,
           CASE WHEN revenue >= max(revenue) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                THEN 1 ELSE 0 END AS is_peak
    FROM daily
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_date)
    ORDER BY o_orderpriority, order_date
    """,
)
def win_rolling_frames(spark, sf_dir):
    t = Tables(spark, sf_dir)
    base = W.partitionBy("o_orderpriority").orderBy("order_date")
    rev = F.col("revenue")
    ma7 = F.avg(rev).over(base.rowsBetween(-6, 0))
    ma30 = F.avg(rev).over(base.rowsBetween(-29, 0))
    return _daily_revenue(t).select(
        "o_orderpriority",
        "order_date",
        "revenue",
        R(ma7).alias("ma_7"),
        R(ma30).alias("ma_30"),
        R(F.max(rev).over(base.rowsBetween(-251, 0))).alias("high_252"),
        R(F.min(rev).over(base.rowsBetween(-251, 0))).alias("low_252"),
        F.when(ma7 > ma30, "uptrend").otherwise("downtrend").alias("ma_trend"),
        F.when(rev >= F.max(rev).over(base.rowsBetween(-3, 3)), 1).otherwise(0).alias("is_peak"),
    ).orderBy("o_orderpriority", "order_date")


# ---------------------------------------------------------------------------
# W10 — centered window for peak detection
# (reference fct_keyword_trends.sql:49-57: rows between 3 preceding and 3
# following).
# ---------------------------------------------------------------------------
@register(
    "win_centered_peak",
    extra=True,
    sql=f"""
    WITH daily AS ({_DAILY_SQL}),
    flagged AS (
      SELECT o_orderpriority, order_date, revenue,
             CASE WHEN revenue >= max(revenue) OVER (PARTITION BY o_orderpriority ORDER BY order_date
                                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  THEN 1 ELSE 0 END AS is_peak
      FROM daily)
    SELECT o_orderpriority, CAST(sum(is_peak) AS BIGINT) AS n_peaks,
           round(max(CASE WHEN is_peak = 1 THEN revenue END), {DP}) AS max_peak_revenue
    FROM flagged GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def win_centered_peak(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("order_date").rowsBetween(-3, 3)
    rev = F.col("revenue")
    flagged = _daily_revenue(t).withColumn(
        "is_peak", F.when(rev >= F.max(rev).over(w), 1).otherwise(0)
    )
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.sum("is_peak").alias("n_peaks"),
            R(F.max(F.when(F.col("is_peak") == 1, rev))).alias("max_peak_revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A13 — group total broadcast back to rows (pandas .transform('sum')) →
# share-of-group via an unordered partition window
# (reference pages/9_FDA_Food_Events.py:346).
# ---------------------------------------------------------------------------
@register(
    "win_group_share",
    extra=True,
    sql=f"""
    WITH shared AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             sum(c_acctbal) OVER (PARTITION BY c_mktsegment) AS segment_total
      FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(max(c_acctbal / segment_total) * 100, {DP}) AS max_share_pct,
           round(min(segment_total), {DP}) AS segment_total
    FROM shared GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def win_group_share(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("c_mktsegment")
    shared = t.customer.filter(F.col("c_acctbal") > 0).select(
        "c_mktsegment",
        "c_acctbal",
        F.sum("c_acctbal").over(w).alias("segment_total"),
    )
    return (
        shared.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            R(F.max(F.col("c_acctbal") / F.col("segment_total")) * 100).alias("max_share_pct"),
            R(F.min("segment_total")).alias("segment_total"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# W2 — best-record pick with a CASE expression in the ORDER BY
# (reference stg_fda__food_events.sql:18-29: prefer 'Suspect' product rows).
# ---------------------------------------------------------------------------
@register(
    "win_best_record_case_order",
    extra=True,
    sql="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CASE WHEN event_type = 'purchase' THEN 0
                             WHEN event_type = 'signup'   THEN 1
                             ELSE 2 END,
                        ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT event_type AS best_event_type, count(*) AS n_users
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
)
def win_best_record_case_order(spark, sf_dir):
    t = Tables(spark, sf_dir)
    preference = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(2)
    )
    w = W.partitionBy("user_id").orderBy(
        preference, F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("best_event_type"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("best_event_type")
    )


# ---------------------------------------------------------------------------
# R5/R6 — first/last per group + normalize-to-baseline (index = 100)
# (reference pages/10_Stock_Prices.py:176-189,266-279).
# ---------------------------------------------------------------------------
@register(
    "win_first_last_normalize",
    sql=f"""
    WITH daily AS ({_DAILY_SQL}),
    indexed AS (
      SELECT o_orderpriority, order_date, revenue,
             first_value(revenue) OVER w AS first_rev,
             last_value(revenue)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_rev
      FROM daily
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_date))
    SELECT o_orderpriority,
           round(min(100.0 * revenue / nullif(first_rev, 0)), {DP}) AS min_index,
           round(max(100.0 * revenue / nullif(first_rev, 0)), {DP}) AS max_index,
           round(max(last_rev), {DP})  AS final_revenue,
           round(max(100.0 * (last_rev - first_rev) / nullif(first_rev, 0)), {DP}) AS period_change_pct
    FROM indexed GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def win_first_last_normalize(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("order_date")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    rev = F.col("revenue")
    indexed = _daily_revenue(t).select(
        "o_orderpriority",
        rev.alias("revenue"),
        F.first(rev).over(w).alias("first_rev"),
        F.last(rev).over(wfull).alias("last_rev"),
    )
    idx = F.lit(100.0) * F.col("revenue") / F.nullif(F.col("first_rev"), F.lit(0.0))
    return (
        indexed.groupBy("o_orderpriority")
        .agg(
            R(F.min(idx)).alias("min_index"),
            R(F.max(idx)).alias("max_index"),
            R(F.max("last_rev")).alias("final_revenue"),
            R(
                F.max(
                    F.lit(100.0)
                    * (F.col("last_rev") - F.col("first_rev"))
                    / F.nullif(F.col("first_rev"), F.lit(0.0))
                )
            ).alias("period_change_pct"),
        )
        .orderBy("o_orderpriority")
    )
