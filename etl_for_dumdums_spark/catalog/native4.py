"""Spark 4 native surfaces as oracled catalog queries.

Four engine capabilities that shipped with Spark 4.x, each expressed as a
query with a DuckDB oracle twin so the driver's hash comparison covers them:

  * VARIANT semi-structured type (``parse_json`` / ``variant_get``) — the
    shredded binary-JSON type that replaces per-access string re-parsing.
  * ``DataFrame.lateralJoin`` — correlated per-row subqueries; Catalyst
    decorrelates a correlated ORDER BY … LIMIT k into a map-side
    ``WindowGroupLimit`` + hash join (verified in the plan pin test), NOT a
    nested loop — the scale-correct top-k-per-key shape.
  * ``listagg … WITHIN GROUP (ORDER BY …)`` — deterministic ordered string
    aggregation (SQL:2016), vs DuckDB's ``string_agg(… ORDER BY …)``.
  * ``DataFrame.transpose`` — presentation-layer row/column flip.

DataSketches HLL (``hll_sketch_agg`` / ``hll_union_agg``) lives in
tests/test_native4.py instead of an oracle row: no SQL engine can restate
the DataSketches estimate, so its determinism, merge (union == direct) and
error-bound properties are pytest-pinned, same policy as
text_compression_ratio's zlib values.

Reference parity: the reference extracts JSON props in SQL
(stg_hn__stories.sql-style scalar extraction) and builds per-group top-k
lists in pandas; these are the Spark-4-native re-expressions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import Tables, register

# ---------------------------------------------------------------------------
# VARIANT: build a nested JSON document per event (identically in both
# engines, from deterministic column arithmetic — same injection pattern as
# text_pii_scan), parse it ONCE to VARIANT, then take typed paths out of it.
# The 100 TB story: a string JSON column re-parses on every access; VARIANT
# parses once into a shredded binary encoding and every ``variant_get`` is a
# typed offset lookup, so the per-access cost stops scaling with document
# size. All outputs integer-exact → bit-strict hash.
# ---------------------------------------------------------------------------
@register(
    "scalar_variant_json",
    extra=True,
    sql="""
    WITH docs AS (
      SELECT '{"id":' || event_id || ',"et":"' || event_type ||
             '","u":{"uid":' || user_id || ',"flags":[' || (event_id % 2) ||
             ',' || (user_id % 3) || ']},"props":' || coalesce(props, '{}') ||
             '}' AS js
      FROM events)
    SELECT CAST(js ->> '$.et' AS VARCHAR)                         AS event_type,
           count(*)                                               AS n,
           CAST(sum(CAST(js ->> '$.u.uid' AS BIGINT)) AS BIGINT)  AS sum_uid,
           CAST(sum(CAST(js ->> '$.u.flags[1]' AS BIGINT)) AS BIGINT) AS sum_flag1,
           CAST(sum(TRY_CAST(js ->> '$.props.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count_if(TRY_CAST(js ->> '$.props.k' AS BIGINT) IS NULL) AS BIGINT)
                                                                  AS n_missing_k
    FROM docs
    GROUP BY 1 ORDER BY 1
    """,
)
def scalar_variant_json(spark, sf_dir):
    t = Tables(spark, sf_dir)
    js = F.concat(
        F.lit('{"id":'),
        F.col("event_id"),
        F.lit(',"et":"'),
        F.col("event_type"),
        F.lit('","u":{"uid":'),
        F.col("user_id"),
        F.lit(',"flags":['),
        F.col("event_id") % 2,
        F.lit(","),
        F.col("user_id") % 3,
        F.lit(']},"props":'),
        F.coalesce(F.col("props"), F.lit("{}")),
        F.lit("}"),
    )
    # parse ONCE per row; every extraction below is a typed path into the
    # shredded VARIANT binary, not a JSON string re-parse per aggregate input
    # (the scalar_json_extract lesson, solved by the engine type this time)
    pre = t.events.select(F.parse_json(js).alias("v")).select(
        F.variant_get("v", "$.et", "string").alias("event_type"),
        F.variant_get("v", "$.u.uid", "bigint").alias("uid"),
        F.variant_get("v", "$.u.flags[1]", "bigint").alias("flag1"),
        F.try_variant_get("v", "$.props.k", "bigint").alias("k"),
    )
    return (
        pre.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("uid").alias("sum_uid"),
            F.sum("flag1").alias("sum_flag1"),
            F.sum("k").alias("sum_k"),
            F.count_if(F.col("k").isNull()).alias("n_missing_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# lateralJoin: richest-2 suppliers per nation as a correlated subquery.
# Catalyst's DecorrelateInnerQuery turns the per-nation ORDER BY + LIMIT 2
# into WindowGroupLimit(partial) → shuffle → WindowGroupLimit(final) over the
# supplier side plus a broadcast hash join with nation — i.e. the engine
# derives the same bounded top-k-per-key plan win_top_n_per_group builds by
# hand (map-side group-limit prunes to ≤2 rows per key per task BEFORE the
# shuffle). Plan pinned in tests/test_native4.py.
# ---------------------------------------------------------------------------
@register(
    "join_lateral_topk",
    extra=True,
    sql="""
    SELECT n.n_name AS nation, s.s_suppkey, s.s_name,
           round(s.s_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_suppkey
      LIMIT 2) s
    ORDER BY nation, s_suppkey
    """,
)
def join_lateral_topk(spark, sf_dir):
    t = Tables(spark, sf_dir)
    per_nation = (
        t.supplier.where(F.col("s_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey")
        .limit(2)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        t.nation.lateralJoin(per_nation)
        .select(
            F.col("n_name").alias("nation"),
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .orderBy("nation", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# listagg WITHIN GROUP: ordered string aggregation. The aggregation input is
# pre-bounded to the top-8 customers per segment (row_number ≤ 8 BEFORE the
# agg — the events_sequence_pattern lesson: cap the input, not the output),
# so per-group aggregation state is O(8 names), never O(segment size).
# ---------------------------------------------------------------------------
@register(
    "agg_listagg_ordered",
    extra=True,
    sql="""
    WITH top8 AS (
      SELECT c_mktsegment, c_name, c_acctbal
      FROM customer
      QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal DESC, c_custkey) <= 8)
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_name) AS top_names,
           CAST(count(*) AS BIGINT) AS n_listed
    FROM top8
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def agg_listagg_ordered(spark, sf_dir):
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    rn = F.row_number().over(
        W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    )
    top8 = t.customer.withColumn("rn", rn).where(F.col("rn") <= 8)
    return (
        top8.groupBy("c_mktsegment")
        .agg(
            F.expr(
                "listagg(c_name, ',') WITHIN GROUP (ORDER BY c_acctbal DESC, c_name)"
            ).alias("top_names"),
            F.count("*").alias("n_listed"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# ANSI-safe scalar family: try_cast / try_divide / try_add / try_to_number
# return NULL instead of failing the job on bad rows — the ETL-safe form
# under ANSI mode (Spark 4's default), where a single malformed record in
# 100 TB would otherwise kill the whole stage. The oracle restates each
# failure condition explicitly (TRY_CAST / CASE guards), so the NULL
# semantics are value-checked, not just type-checked.
# ---------------------------------------------------------------------------
@register(
    "scalar_try_safe_ops",
    extra=True,
    sql="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN 'n/a'
                  ELSE CAST(o_orderkey % 97 AS VARCHAR) END AS qty_str,
             (o_orderkey % 5) AS denom,
             o_totalprice
      FROM orders)
    SELECT o_orderkey,
           TRY_CAST(qty_str AS BIGINT) AS qty,
           CASE WHEN denom = 0 THEN NULL
                ELSE round(o_totalprice / denom, 4) END AS price_per,
           CASE WHEN TRY_CAST(qty_str AS BIGINT) IS NULL THEN NULL
                ELSE 9223372036854775807 - TRY_CAST(qty_str AS BIGINT) + 0 END
             AS near_overflow_ok,
           CAST(NULL AS BIGINT) AS overflow_is_null
    FROM raw
    ORDER BY o_orderkey
    LIMIT 500
    """,
)
def scalar_try_safe_ops(spark, sf_dir):
    t = Tables(spark, sf_dir)
    raw = t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("n/a"))
        .otherwise((F.col("o_orderkey") % 97).cast("string"))
        .alias("qty_str"),
        (F.col("o_orderkey") % 5).alias("denom"),
        "o_totalprice",
    )
    qty = F.col("qty_str").try_cast("bigint")
    max_long = F.lit(9223372036854775807)
    return (
        raw.select(
            "o_orderkey",
            qty.alias("qty"),
            F.round(F.try_divide(F.col("o_totalprice"), F.nullif("denom", F.lit(0))), 4).alias(
                "price_per"
            ),
            # try_add at the boundary: MAX - qty + 0 is fine (NULL propagates
            # from unparseable qty)...
            F.try_add(F.try_subtract(max_long, qty), F.lit(0)).alias("near_overflow_ok"),
            # ...while MAX + 1 overflows and try_add yields NULL, never a
            # job-killing ANSI ArithmeticException
            F.try_add(max_long, F.lit(1)).alias("overflow_is_null"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# SQL UDFs (SQL:2016 CREATE FUNCTION ... RETURN, Spark 4.0): reusable scalar
# logic declared IN SQL, inlined by Catalyst at plan time — unlike Python
# UDFs there is no serialization boundary, so the expression stays inside
# whole-stage codegen and every pushdown still applies. The reference keeps
# recode logic in per-model SQL CASE blocks (fct_oura_daily.sql-style); a
# SQL UDF is the shareable form. The oracle states the inlined expansion —
# which is exactly what Catalyst executes.
# ---------------------------------------------------------------------------
_TIER_CASE = """CASE WHEN {bal} >= 7500 THEN 'platinum'
                     WHEN {bal} >= 5000 THEN 'gold'
                     WHEN {bal} >= 1000 THEN 'silver'
                     WHEN {bal} >= 0    THEN 'bronze'
                     ELSE 'delinquent' END"""


@register(
    "scalar_sql_udf_tiers",
    extra=True,
    sql=f"""
    SELECT c_mktsegment,
           {_TIER_CASE.format(bal='c_acctbal')} AS tier,
           count(*) AS n,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def scalar_sql_udf_tiers(spark, sf_dir):
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bal_tier(bal DOUBLE) RETURNS STRING "
        f"RETURN {_TIER_CASE.format(bal='bal')}"
    )
    df = Tables(spark, sf_dir).customer
    df.createOrReplaceTempView("_sqludf_customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               bal_tier(c_acctbal) AS tier,
               count(*) AS n,
               round(avg(c_acctbal), 2) AS avg_bal
        FROM _sqludf_customer
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# transpose: per-event-type counters flipped to one column per type. The new
# column names come from DATA, so transpose necessarily collects the index
# column to the driver — which is why it is applied strictly AFTER the
# aggregation has reduced the frame to #event_types rows (5 here; bounded by
# the domain, not the data volume). Presentation-layer op by design; the
# event_type domain is fixed so the oracle can state the columns.
# ---------------------------------------------------------------------------
@register(
    "reshape_transpose",
    extra=True,
    sql="""
    SELECT 'n_events' AS key,
           CAST(count_if(event_type = 'click') AS BIGINT)    AS click,
           CAST(count_if(event_type = 'error') AS BIGINT)    AS error,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count_if(event_type = 'signup') AS BIGINT)   AS signup,
           CAST(count_if(event_type = 'view') AS BIGINT)     AS view
    FROM events
    UNION ALL
    SELECT 'n_users',
           CAST(count(DISTINCT user_id) FILTER (event_type = 'click') AS BIGINT),
           CAST(count(DISTINCT user_id) FILTER (event_type = 'error') AS BIGINT),
           CAST(count(DISTINCT user_id) FILTER (event_type = 'purchase') AS BIGINT),
           CAST(count(DISTINCT user_id) FILTER (event_type = 'signup') AS BIGINT),
           CAST(count(DISTINCT user_id) FILTER (event_type = 'view') AS BIGINT)
    FROM events
    ORDER BY key
    """,
)
def reshape_transpose(spark, sf_dir):
    t = Tables(spark, sf_dir)
    agg = (
        t.events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )
    # transpose sorts the new columns by index value ascending — matches the
    # oracle's fixed click..view column list for the fixed event_type domain
    return agg.transpose().orderBy("key")
