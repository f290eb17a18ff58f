"""Warehouse-pattern operators: fact-to-SCD2 as-of join, day-of-week
seasonality, exact per-group mode, and a freshness audit.

* ``join_fact_to_scd2`` — THE dimensional-warehouse join: facts land on the
  SCD2 dimension interval valid at fact time. The dimension here is built
  in-query by the reusable ``operators/scd.py`` interval builder (the user's
  evolving ``props.k``-band state over their event stream); facts are the
  purchase events. The output carries an in-query proof that the interval
  set tiles time per user: every purchase matches EXACTLY one interval
  (n_unmatched ≡ 0, n_multi_match ≡ 0 columns).
* ``ts_seasonal_dow_profile`` — day-of-week seasonality as an exact integer
  ppm ratio of the DOW mean to the overall mean, per event type. DOW is
  epoch-day mod 7 (engine-neutral — no calendar-function Sunday=0/1
  divergence; 1970-01-01 ≡ dow 0 = Thursday). The 128-bit cross product
  rides DECIMAL(38,0)/HUGEINT like text_word_pmi.
* ``agg_mode_per_group`` — exact modal value with a deterministic tie-break
  (max count, then smallest value), computed as a row_number over the
  per-(group, value) count frame — the window's partitions are bounded by
  the value domain, never by row count.
* ``ops_freshness_lag`` — the data-freshness audit every warehouse runs
  first: per fact table, row count, max business date, and the staleness
  lag in whole days against the fixed as-of date.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import Tables, register

# ---------------------------------------------------------------------------
_SCD_BAND = 25  # props.k DIV 25 → 4 user-state bands


@register(
    "join_fact_to_scd2",
    extra=True,
    sql=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // {_SCD_BAND} AS band,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    ordered AS (
      SELECT *, lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_band
      FROM ev),
    flagged AS (
      SELECT *, CASE WHEN prev_band IS NULL OR prev_band <> band
                     THEN 1 ELSE 0 END AS chg
      FROM ordered),
    runs AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged),
    intervals AS (
      SELECT user_id, band, run_id, min(ts) AS valid_from
      FROM runs GROUP BY user_id, band, run_id),
    dim AS (
      SELECT user_id, band, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM intervals),
    facts AS (
      SELECT user_id, ts, event_id, cents FROM ev WHERE event_type = 'purchase'),
    joined AS (
      SELECT f.event_id, f.cents, d.band
      FROM facts f JOIN dim d
        ON f.user_id = d.user_id
       AND d.valid_from <= f.ts
       AND (d.valid_to IS NULL OR f.ts < d.valid_to)),
    match_audit AS (
      SELECT (SELECT count(*) FROM facts) - count(DISTINCT event_id) AS n_unmatched,
             count(*) - count(DISTINCT event_id) AS n_multi_match
      FROM joined)
    SELECT j.band,
           count(*) AS n_purchases,
           CAST(sum(j.cents) AS BIGINT) AS revenue_cents,
           a.n_unmatched, a.n_multi_match
    FROM joined j CROSS JOIN match_audit a
    GROUP BY j.band, a.n_unmatched, a.n_multi_match
    ORDER BY j.band
    """,
)
def join_fact_to_scd2(spark, sf_dir):
    from ..operators.scd import scd2_intervals_from_events

    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.expr(f"CAST(get_json_object(props, '$.k') AS BIGINT) DIV {_SCD_BAND}").alias("band"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    dim = scd2_intervals_from_events(ev, "user_id", "ts", "band", "event_id").select(
        F.col("key").alias("d_user"), F.col("attr").alias("band"), "valid_from", "valid_to"
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "cents"
    )
    joined = facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select("event_id", "cents", "band")
    n_facts = facts.agg(F.count("*").alias("nf"))
    audit = (
        joined.agg(
            F.count("*").alias("nj"),
            F.count_distinct("event_id").alias("nd"),
        )
        .crossJoin(F.broadcast(n_facts))
        .select(
            (F.col("nf") - F.col("nd")).alias("n_unmatched"),
            (F.col("nj") - F.col("nd")).alias("n_multi_match"),
        )
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(audit))
        .select("band", "n_purchases", "revenue_cents", "n_unmatched", "n_multi_match")
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
@register(
    "ts_seasonal_dow_profile",
    extra=True,
    sql="""
    WITH base AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000) % 7 AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT event_type, dow, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
      FROM base GROUP BY event_type, dow),
    tot AS (
      SELECT *, sum(n) OVER (PARTITION BY event_type) AS n_et,
             sum(s) OVER (PARTITION BY event_type) AS s_et
      FROM cells)
    SELECT event_type, CAST(dow AS BIGINT) AS dow, n,
           CAST(s // n AS BIGINT) AS dow_mean_cents,
           CAST((s::HUGEINT * n_et * 1000000) // (n::HUGEINT * s_et) AS BIGINT)
             AS ratio_ppm
    FROM tot ORDER BY event_type, dow
    """,
)
def ts_seasonal_dow_profile(spark, sf_dir):
    t = Tables(spark, sf_dir)
    base = t.events.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000") % 7).alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = base.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"), F.sum("cents").cast("long").alias("s")
    )
    wet = W.partitionBy("event_type")
    tot = cells.withColumn("n_et", F.sum("n").over(wet)).withColumn(
        "s_et", F.sum("s").over(wet)
    )
    return tot.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        "n",
        F.expr("CAST(s DIV n AS BIGINT)").alias("dow_mean_cents"),
        F.expr(
            "CAST((CAST(s AS DECIMAL(38,0)) * n_et * 1000000)"
            " DIV (CAST(n AS DECIMAL(38,0)) * s_et) AS BIGINT)"
        ).alias("ratio_ppm"),
    ).orderBy("event_type", "dow")


# ---------------------------------------------------------------------------
@register(
    "agg_mode_per_group",
    extra=True,
    sql="""
    WITH counts AS (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             count(*) AS n
      FROM events GROUP BY event_type, k),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, k) AS rn,
             sum(n) OVER (PARTITION BY event_type) AS n_total
      FROM counts)
    SELECT event_type, k AS mode_k, n AS mode_count,
           CAST(n * 1000000 // n_total AS BIGINT) AS mode_share_ppm,
           CAST(n_total AS BIGINT) AS n_rows
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
)
def agg_mode_per_group(spark, sf_dir):
    t = Tables(spark, sf_dir)
    counts = t.events.groupBy(
        "event_type",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("k"),
    ).agg(F.count("*").alias("n"))
    wg = W.partitionBy("event_type")
    ranked = counts.withColumn(
        "rn", F.row_number().over(wg.orderBy(F.desc("n"), "k"))
    ).withColumn("n_total", F.sum("n").over(wg))
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("k").alias("mode_k"),
            F.col("n").alias("mode_count"),
            F.expr("CAST(n * 1000000 DIV n_total AS BIGINT)").alias("mode_share_ppm"),
            F.col("n_total").cast("long").alias("n_rows"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
_FRESH_ASOF = "1998-08-02"


@register(
    "ops_freshness_lag",
    extra=True,
    sql=f"""
    SELECT 'events' AS table_name, count(*) AS n_rows,
           CAST(max(ts) AS DATE) AS max_date,
           date_diff('day', CAST(max(ts) AS DATE), DATE '{_FRESH_ASOF}') AS lag_days
    FROM events
    UNION ALL
    SELECT 'lineitem', count(*), CAST(max(l_shipdate) AS DATE),
           date_diff('day', CAST(max(l_shipdate) AS DATE), DATE '{_FRESH_ASOF}')
    FROM lineitem
    UNION ALL
    SELECT 'orders', count(*), CAST(max(o_orderdate) AS DATE),
           date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '{_FRESH_ASOF}')
    FROM orders
    ORDER BY table_name
    """,
)
def ops_freshness_lag(spark, sf_dir):
    t = Tables(spark, sf_dir)
    asof = F.lit(_FRESH_ASOF).cast("date")

    def audit(df, name, date_col):
        mx = F.max(date_col).cast("date")
        return df.agg(
            F.count("*").alias("n_rows"),
            mx.alias("max_date"),
            F.datediff(asof, mx).cast("long").alias("lag_days"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "max_date", "lag_days")

    return (
        audit(t.events, "events", F.col("ts"))
        .unionByName(audit(t.lineitem, "lineitem", F.col("l_shipdate")))
        .unionByName(audit(t.orders, "orders", F.col("o_orderdate")))
        .orderBy("table_name")
    )
