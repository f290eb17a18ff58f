"""Privacy operators for training-data pipelines (beyond-reference).

Before corpus text or user tables feed a training run, pipelines scrub
direct identifiers and audit quasi-identifier re-identification risk:

  * ``privacy_pseudonymize`` — detect ``Customer#NNNNNNNNN``-style direct
    identifiers by regex and replace each with a deterministic salted-hash
    pseudonym (consistent across rows, irreversible without the mapping).
    Reports detection coverage and verifies the pseudonym map is
    collision-free (distinct ids == distinct pseudonyms).
  * ``privacy_k_anonymity`` — the standard k-anonymity audit over a
    quasi-identifier tuple (here nation × market segment): group sizes,
    the minimum k, and how many rows sit in groups below the k threshold
    (those rows are re-identifiable by the tuple alone).

Scale design (100 TB): both are single hash-shuffle aggregates on the
identifier / quasi-identifier key — the same skew-free shape as exact
dedup; pseudonymization itself is a pure per-row projection (no shuffle)
that would run inside the scan's whole-stage codegen. All arithmetic is
integer except one final rounded percentage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import ROUND_DP as DP
from . import Tables, register

# Deterministic pseudonym: salted md5 prefix. 12 hex chars = 48 bits —
# collision-free with overwhelming probability at any test SF, and the
# query VERIFIES absence of collisions rather than assuming it.
_PII_SALT = "pseud-v1|"
_ID_RE = "Customer#([0-9]+)"


@register(
    "privacy_pseudonymize",
    extra=True,
    sql=f"""
    WITH scrubbed AS (
      SELECT c_mktsegment,
             regexp_extract(c_name, '{_ID_RE}', 1) AS raw_id,
             CASE WHEN regexp_matches(c_name, '{_ID_RE}')
                  THEN 'CUST_' || substr(md5('{_PII_SALT}' || c_name), 1, 12)
                  ELSE c_name END AS pseudonym
      FROM customer)
    SELECT c_mktsegment,
           count(*) AS n_rows,
           CAST(count_if(raw_id != '') AS BIGINT) AS n_identified,
           count(DISTINCT CASE WHEN raw_id != '' THEN raw_id END) AS n_distinct_ids,
           count(DISTINCT CASE WHEN raw_id != '' THEN pseudonym END) AS n_distinct_pseudonyms,
           min(pseudonym) AS sample_pseudonym
    FROM scrubbed
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def privacy_pseudonymize(spark, sf_dir):
    t = Tables(spark, sf_dir)
    matched = F.regexp_extract(F.col("c_name"), _ID_RE, 1)
    scrubbed = t.customer.select(
        "c_mktsegment",
        matched.alias("raw_id"),
        F.when(
            matched != "",
            F.concat(F.lit("CUST_"), F.substring(F.md5(F.concat(F.lit(_PII_SALT), F.col("c_name"))), 1, 12)),
        )
        .otherwise(F.col("c_name"))
        .alias("pseudonym"),
    )
    return (
        scrubbed.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(F.col("raw_id") != "").alias("n_identified"),
            F.count_distinct(F.when(F.col("raw_id") != "", F.col("raw_id"))).alias(
                "n_distinct_ids"
            ),
            F.count_distinct(F.when(F.col("raw_id") != "", F.col("pseudonym"))).alias(
                "n_distinct_pseudonyms"
            ),
            F.min("pseudonym").alias("sample_pseudonym"),
        )
        .orderBy("c_mktsegment")
    )


def pseudonymize(df, col: str, pattern: str = _ID_RE, salt: str = _PII_SALT):
    """Reusable scrub: replace values of ``col`` matching ``pattern`` with a
    deterministic salted-hash pseudonym; non-matching values pass through.
    Pure projection — no shuffle, stays inside whole-stage codegen."""
    hit = F.regexp_extract(F.col(col), pattern, 0)
    pseud = F.concat(F.lit("CUST_"), F.substring(F.md5(F.concat(F.lit(salt), F.col(col))), 1, 12))
    return df.withColumn(col, F.when(hit != "", pseud).otherwise(F.col(col)))


_K_THRESHOLD = 10


@register(
    "privacy_k_anonymity",
    extra=True,
    sql=f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS k
      FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT count(*) AS n_groups,
           min(k) AS k_min,
           max(k) AS k_max,
           CAST(count_if(k < {_K_THRESHOLD}) AS BIGINT) AS n_groups_below_k,
           CAST(sum(CASE WHEN k < {_K_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           round(sum(CASE WHEN k < {_K_THRESHOLD} THEN k ELSE 0 END) * 100.0
                 / sum(k), {DP}) AS pct_rows_at_risk
    FROM groups
    """,
)
def privacy_k_anonymity(spark, sf_dir):
    t = Tables(spark, sf_dir)
    groups = t.customer.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("k"))
    at_risk = F.sum(F.when(F.col("k") < _K_THRESHOLD, F.col("k")).otherwise(0))
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.count_if(F.col("k") < _K_THRESHOLD).alias("n_groups_below_k"),
        at_risk.alias("n_rows_at_risk"),
        F.round(at_risk * 100.0 / F.sum("k"), DP).alias("pct_rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit — k-anonymity's companion: a group can be large (k-safe)
# yet still leak if everyone in it shares the same SENSITIVE value. Here the
# quasi-identifier tuple is (nation, market segment) and the sensitive
# attribute is the account-balance band (negative / low / high). Reports,
# per quasi-id group: size k, l = distinct sensitive values, the modal
# sensitive share (a high share is the probabilistic-inference risk even
# when l >= threshold), and the diversity verdict.
#
# Scale design (100 TB): two chained hash aggregates on (quasi-id, sensitive)
# then (quasi-id) — the same skew-free shuffle shape as privacy_k_anonymity;
# banding is a per-row CASE inside the scan's codegen. All arithmetic is
# integer except the one rounded share.
# ---------------------------------------------------------------------------
_L_THRESHOLD = 3
_BAND_SQL = """CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 5000 THEN 'low'
                    ELSE 'high' END"""


@register(
    "privacy_l_diversity",
    extra=True,
    sql=f"""
    WITH banded AS (
      SELECT c_nationkey, c_mktsegment, {_BAND_SQL} AS band
      FROM customer),
    cells AS (
      SELECT c_nationkey, c_mktsegment, band, count(*) AS n
      FROM banded GROUP BY c_nationkey, c_mktsegment, band),
    groups AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(sum(n) AS BIGINT) AS k,
             count(*) AS l_distinct,
             max(n) AS modal_n
      FROM cells GROUP BY c_nationkey, c_mktsegment)
    SELECT c_nationkey, c_mktsegment, k, l_distinct,
           round(modal_n * 100.0 / k, {DP}) AS modal_share_pct,
           CASE WHEN l_distinct >= {_L_THRESHOLD} THEN 1 ELSE 0 END AS is_l_diverse
    FROM groups ORDER BY c_nationkey, c_mktsegment
    """,
)
def privacy_l_diversity(spark, sf_dir):
    t = Tables(spark, sf_dir)
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    cells = (
        t.customer.select("c_nationkey", "c_mktsegment", band.alias("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count("*").alias("n"))
    )
    groups = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("bigint").alias("k"),
        F.count("*").alias("l_distinct"),
        F.max("n").alias("modal_n"),
    )
    return groups.select(
        "c_nationkey",
        "c_mktsegment",
        "k",
        "l_distinct",
        F.round(F.col("modal_n") * 100.0 / F.col("k"), DP).alias("modal_share_pct"),
        F.when(F.col("l_distinct") >= _L_THRESHOLD, 1).otherwise(0).alias(
            "is_l_diverse"
        ),
    ).orderBy("c_nationkey", "c_mktsegment")
