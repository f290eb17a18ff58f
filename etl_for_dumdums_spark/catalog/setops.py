"""Set operations (SURVEY.md §2.8 U1-U3).

The reference builds rollup rows by hand with UNION ALL and date spines
with UNION DISTINCT; both are reproduced, plus the grouping-sets redesign
(ROLLUP) the survey recommends — all shuffle-once shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import ROUND_DP as DP
from . import Tables, register

R = lambda c: F.round(c, DP)  # noqa: E731


# ---------------------------------------------------------------------------
# U1 — hand-built rollup rows via UNION ALL
# (reference fct_fda_recalls_by_topic.sql:72-108: per-topic rows ∪ 'Any' rows).
# ---------------------------------------------------------------------------
@register(
    "setop_union_all_rollup",
    sql=f"""
    SELECT o_orderpriority AS priority, count(*) AS n_orders,
           round(sum(o_totalprice), {DP}) AS revenue
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL (Any)' AS priority, count(*) AS n_orders,
           round(sum(o_totalprice), {DP}) AS revenue
    FROM orders
    ORDER BY priority
    """,
)
def setop_union_all_rollup(spark, sf_dir):
    t = Tables(spark, sf_dir)
    per = t.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"), R(F.sum("o_totalprice")).alias("revenue")
    )
    total = t.orders.agg(
        F.count("*").alias("n_orders"), R(F.sum("o_totalprice")).alias("revenue")
    ).select(F.lit("ALL (Any)").alias("priority"), "n_orders", "revenue")
    return per.unionByName(total).orderBy("priority")


# ---------------------------------------------------------------------------
# U2 — UNION DISTINCT date spine across sources
# (reference fct_oura_daily.sql:38-46: all_days from 4 tables).
# ---------------------------------------------------------------------------
@register(
    "setop_union_distinct_spine",
    sql="""
    WITH spine AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week FROM orders
      UNION
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week FROM lineitem)
    SELECT count(*) AS n_weeks, min(week) AS first_week, max(week) AS last_week
    FROM spine
    """,
)
def setop_union_distinct_spine(spark, sf_dir):
    t = Tables(spark, sf_dir)
    a = t.orders.select(F.date_trunc("week", "o_orderdate").cast("date").alias("week"))
    b = t.lineitem.select(F.date_trunc("week", "l_shipdate").cast("date").alias("week"))
    return (
        a.union(b)
        .distinct()
        .agg(
            F.count("*").alias("n_weeks"),
            F.min("week").alias("first_week"),
            F.max("week").alias("last_week"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 — global top-k: multi-key sort with explicit NULL placement + limit
# (reference pages/1_Linear_Issues.py:257-261 na_position='last';
#  pages/10_Stock_Prices.py:225 nlargest). Top-k is a partial per-partition
# TakeOrdered — no full sort at scale.
# ---------------------------------------------------------------------------
@register(
    "sort_topk_nulls_last",
    sql="""
    SELECT c_custkey, c_mktsegment,
           nullif(round(c_acctbal, 2), 0.0) AS balance
    FROM customer
    ORDER BY balance DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
    LIMIT 20
    """,
)
def sort_topk_nulls_last(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(
            "c_custkey",
            "c_mktsegment",
            F.nullif(F.round("c_acctbal", 2), F.lit(0.0)).alias("balance"),
        )
        .orderBy(
            F.col("balance").desc_nulls_last(),
            F.col("c_mktsegment").asc(),
            F.col("c_custkey").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Grouping-sets redesign of U1 — native ROLLUP (the survey's recommended
# re-expression; one shuffle instead of two scans).
# ---------------------------------------------------------------------------
@register(
    "setop_native_rollup",
    extra=True,
    sql=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), {DP}) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def setop_native_rollup(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), R(F.sum("o_totalprice")).alias("revenue"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# Native GROUPING SETS with grouping() markers (beyond the reference's
# hand-built UNION ALL rollup, fct_fda_recalls_by_topic.sql:72-108): all
# four aggregation shapes — (flag,status), (flag), (status), grand total —
# in ONE shuffle with map-side partial aggregation, vs four scans + a union
# at 100 TB. Revenue is summed in exact integer cents so every grouping
# level agrees bit-for-bit across engines regardless of summation order.
# ---------------------------------------------------------------------------
@register(
    "agg_grouping_sets",
    extra=True,
    sql=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0, {DP}) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
    ORDER BY rf, ls
    """,
)
def agg_grouping_sets(spark, sf_dir):
    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n_rows"),
            F.sum("qty").cast("bigint").alias("sum_qty"),
            R(F.sum("cents").cast("bigint") / 100.0).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "g_rf",
            "g_ls",
            "n_rows",
            "sum_qty",
            "revenue",
        )
        .orderBy("rf", "ls")
    )


# ---------------------------------------------------------------------------
# Native CUBE — completes the multi-level aggregation family (rollup ✓,
# grouping sets ✓): all 2^k grouping combinations in one shuffle with
# map-side partials. Exact integer cents keep every level engine-identical.
# ---------------------------------------------------------------------------
@register(
    "agg_cube",
    extra=True,
    sql=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, {DP})
             AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def agg_cube(spark, sf_dir):
    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        "o_orderstatus",
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
            R(F.sum("cents").cast("bigint") / 100.0).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# EXCEPT / INTERSECT (the remaining §2.8 set-op forms): customers who ordered
# in 1996 vs 1997 — retained (INTERSECT), churned (EXCEPT 96→97), and new
# (EXCEPT 97→96), plus each side's cardinality, in ONE result row. Spark's
# exceptAll/intersectAll operators map to the same hash-based set ops the
# SQL states; here the DISTINCT forms are used (key sets, not bags).
#
# Scale design (100 TB): both year sides collapse to DISTINCT keys first
# (hash aggregate), so the set ops touch key sets, never raw orders; each
# set op is one shuffle on the key. Counts aggregate to a single row.
# ---------------------------------------------------------------------------
@register(
    "setop_except_intersect",
    extra=True,
    sql="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= DATE '1996-01-01'
                   AND o_orderdate < DATE '1997-01-01'),
    y97 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= DATE '1997-01-01'
              AND o_orderdate < DATE '1998-01-01'),
    retained AS (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97),
    churned AS (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97),
    fresh AS (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM y96) AS n_1996,
           (SELECT CAST(count(*) AS BIGINT) FROM y97) AS n_1997,
           (SELECT CAST(count(*) AS BIGINT) FROM retained) AS n_retained,
           (SELECT CAST(count(*) AS BIGINT) FROM churned) AS n_churned,
           (SELECT CAST(count(*) AS BIGINT) FROM fresh) AS n_new,
           (SELECT CAST(min(o_custkey) AS BIGINT) FROM churned) AS first_churned_key
    """,
)
def setop_except_intersect(spark, sf_dir):
    t = Tables(spark, sf_dir)

    def year_keys(y):
        return (
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = year_keys(1996), year_keys(1997)
    retained = y96.intersect(y97)
    churned = y96.exceptAll(y97)  # distinct inputs -> EXCEPT DISTINCT semantics
    fresh = y97.exceptAll(y96)

    def cnt(df, alias):
        return df.agg(F.count("*").cast("long").alias(alias))

    return (
        cnt(y96, "n_1996")
        .crossJoin(F.broadcast(cnt(y97, "n_1997")))
        .crossJoin(F.broadcast(cnt(retained, "n_retained")))
        .crossJoin(F.broadcast(cnt(churned, "n_churned")))
        .crossJoin(F.broadcast(cnt(fresh, "n_new")))
        .crossJoin(
            F.broadcast(
                churned.agg(F.min("o_custkey").cast("long").alias("first_churned_key"))
            )
        )
    )
