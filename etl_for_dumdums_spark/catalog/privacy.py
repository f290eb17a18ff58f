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
