"""Incremental cross-batch dedup (beyond-reference).

At 100 TB you never re-dedup the whole corpus when a new crawl batch
lands: the existing corpus is reduced once to its distinct content
fingerprints and the incoming batch is anti-joined against that set, then
deduped within itself. This module expresses that ingestion shape as a
catalog query: a deterministic hash split of `documents` stands in for
"existing corpus" (80%) vs "incoming batch" (20%), the batch is screened
against the base fingerprint set, and the per-source attrition is
reported.

Drop precedence (the production rule): a batch doc that already exists in
the base corpus is a `dup_vs_base` drop; among the remaining batch docs,
every fingerprint keeps its lowest doc_id and the rest are
`dup_within_batch` drops.

Scale design (100 TB):
  * the base side is reduced to DISTINCT fingerprints before the join —
    |distinct digests| << |docs|, and the anti-join shuffles on the digest
    (uniform md5 key, skew-free). One shuffle each side.
  * at extreme base sizes the digest set rides a Bloom filter broadcast
    as a pre-filter (the pattern `sketch_bloom_membership` demonstrates);
    false positives then rechecked by the exact anti-join. The exact join
    here IS the correctness path — the bloom pass only prunes.
  * the within-batch window partitions by fingerprint — group size is the
    duplicate multiplicity, data-volume-independent for real corpora.
  * membership in base/batch is a pure function of doc_id (same md5-prefix
    hash as catalog/sampling.py), so both engines split identically and a
    re-run is reproducible.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from . import Tables, register
from .sketches import _h_spark, _h_sql

# deterministic corpus/batch split: hash(doc_id) % 10 → 0-7 base, 8-9 batch
_BASE_BUCKETS = 8

_FP_SQL = "md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))), ' '))"


def _fp_spark():
    return F.md5(
        F.concat_ws(
            " ",
            F.sort_array(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))),
        )
    )


@register(
    "dedup_incremental_batch",
    extra=True,
    sql=f"""
    WITH tagged AS (
      SELECT doc_id, source, {_FP_SQL} AS fp,
             {_h_sql("concat('incr:', CAST(doc_id AS VARCHAR))")} % 10 < {_BASE_BUCKETS} AS is_base
      FROM documents),
    base_fps AS (SELECT DISTINCT fp FROM tagged WHERE is_base),
    batch AS (
      SELECT t.doc_id, t.source, t.fp,
             (b.fp IS NOT NULL) AS dup_vs_base
      FROM tagged t LEFT JOIN base_fps b ON t.fp = b.fp
      WHERE NOT t.is_base),
    ranked AS (
      SELECT doc_id, source, dup_vs_base,
             CASE WHEN dup_vs_base THEN NULL
                  ELSE row_number() OVER (
                         PARTITION BY fp, dup_vs_base ORDER BY doc_id)
             END AS rn
      FROM batch)
    SELECT source,
           count(*) AS n_batch,
           CAST(count_if(dup_vs_base) AS BIGINT) AS n_dup_vs_base,
           CAST(count_if(NOT dup_vs_base AND rn > 1) AS BIGINT) AS n_dup_within_batch,
           CAST(count_if(NOT dup_vs_base AND rn = 1) AS BIGINT) AS n_kept,
           round(100.0 * count_if(NOT dup_vs_base AND rn = 1) / count(*), 2) AS pct_kept
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental ingestion dedup: screen a 20% "incoming batch" against
    the 80% "existing corpus" fingerprint set, then dedup within the batch
    (lowest doc_id per fingerprint survives). Per-source attrition report.
    """
    t = Tables(spark, sf_dir)
    tagged = t.documents.select(
        "doc_id",
        "source",
        _fp_spark().alias("fp"),
        (F.expr(_h_spark("concat('incr:', CAST(doc_id AS STRING))")) % 10 < _BASE_BUCKETS).alias(
            "is_base"
        ),
    )
    base_fps = tagged.filter("is_base").select("fp").distinct()
    batch = (
        tagged.filter(~F.col("is_base"))
        .join(base_fps.withColumn("in_base", F.lit(1)), "fp", "left")
        .select(
            "doc_id", "source", "fp", F.col("in_base").isNotNull().alias("dup_vs_base")
        )
    )
    # survivors rank within their fingerprint among non-base-dup batch docs;
    # partitioning by (fp, dup_vs_base) keeps the window key aligned with the
    # oracle's NULL-rank-for-base-dups formulation
    rn = F.when(
        F.col("dup_vs_base"), F.lit(None).cast("int")
    ).otherwise(
        F.row_number().over(W.partitionBy("fp", "dup_vs_base").orderBy("doc_id"))
    )
    ranked = batch.select("doc_id", "source", "dup_vs_base", rn.alias("rn"))
    kept = ~F.col("dup_vs_base") & (F.col("rn") == 1)
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_batch"),
            F.count_if(F.col("dup_vs_base")).cast("bigint").alias("n_dup_vs_base"),
            F.count_if(~F.col("dup_vs_base") & (F.col("rn") > 1))
            .cast("bigint")
            .alias("n_dup_within_batch"),
            F.count_if(kept).cast("bigint").alias("n_kept"),
            F.round(100.0 * F.count_if(kept) / F.count("*"), 2).alias("pct_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Incremental materialized-aggregate maintenance with an IN-QUERY proof:
# the daily revenue rollup is maintained as base-partial ⊕ delta-partial
# (the lambda/incremental-refresh shape — new batches merge into the
# materialized partials, raw history is never rescanned), and the query
# joins the merged result against a direct full recompute, reporting the
# mismatch count (must be 0) alongside the month-grain rollup. Same
# self-proving pattern as sketch_hll_rollup's associativity check: the
# correctness claim is IN the oracled output, not just in a test.
#
# Revenue accumulates in exact integer cents — partial-merge equality for
# float sums would be summation-order-dependent; for integer sums it is an
# identity, which is precisely why the engine's MERGE-maintained marts use
# integer units.
#
# Scale design (100 TB): base and delta each aggregate map-side to one row
# per day before any shuffle; the merge is a full-outer join on the day key
# (calendar-bounded). The "direct" recompute exists only to state the
# proof; production maintains the partial and never rescans.
# ---------------------------------------------------------------------------
_ROLLUP_BASE_BUCKETS = 8  # hash(o_orderkey) % 10 → 0-7 base, 8-9 delta


@register(
    "agg_incremental_rollup",
    extra=True,
    sql=f"""
    WITH tagged AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             {_h_sql("CAST(o_orderkey AS VARCHAR)")} % 10 < {_ROLLUP_BASE_BUCKETS}
               AS in_base
      FROM orders),
    base AS (
      SELECT day, sum(cents) AS rev, count(*) AS n FROM tagged
      WHERE in_base GROUP BY day),
    delta AS (
      SELECT day, sum(cents) AS rev, count(*) AS n FROM tagged
      WHERE NOT in_base GROUP BY day),
    merged AS (
      SELECT coalesce(b.day, d.day) AS day,
             coalesce(b.rev, 0) + coalesce(d.rev, 0) AS rev,
             coalesce(b.n, 0) + coalesce(d.n, 0) AS n
      FROM base b FULL OUTER JOIN delta d ON b.day = d.day),
    direct AS (
      SELECT day, sum(cents) AS rev, count(*) AS n FROM tagged GROUP BY day)
    SELECT CAST(date_trunc('month', m.day) AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(m.n) AS BIGINT) AS n_orders,
           round(CAST(sum(m.rev) AS BIGINT) / 100.0, 2) AS revenue,
           CAST(count_if(m.rev != x.rev OR m.n != x.n) AS BIGINT) AS n_mismatch_days
    FROM merged m JOIN direct x ON m.day = x.day
    GROUP BY 1 ORDER BY month
    """,
)
def agg_incremental_rollup(spark, sf_dir):
    t = Tables(spark, sf_dir)
    tagged = t.orders.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        (
            F.expr(_h_spark("CAST(o_orderkey AS STRING)")) % 10
            < _ROLLUP_BASE_BUCKETS
        ).alias("in_base"),
    )

    def part(df):
        return df.groupBy("day").agg(
            F.sum("cents").alias("rev"), F.count("*").alias("n")
        )

    base = part(tagged.filter(F.col("in_base")))
    delta = part(tagged.filter(~F.col("in_base")))
    merged = (
        base.alias("b")
        .join(delta.alias("d"), F.col("b.day") == F.col("d.day"), "full_outer")
        .select(
            F.coalesce(F.col("b.day"), F.col("d.day")).alias("day"),
            (
                F.coalesce(F.col("b.rev"), F.lit(0))
                + F.coalesce(F.col("d.rev"), F.lit(0))
            ).alias("rev"),
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n"),
        )
    )
    direct = part(tagged)
    return (
        merged.alias("m")
        .join(direct.alias("x"), F.col("m.day") == F.col("x.day"))
        .groupBy(F.date_trunc("month", F.col("m.day")).cast("date").alias("month"))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("m.n").cast("bigint").alias("n_orders"),
            F.round(F.sum("m.rev").cast("bigint") / 100.0, 2).alias("revenue"),
            F.count_if(
                (F.col("m.rev") != F.col("x.rev")) | (F.col("m.n") != F.col("x.n"))
            )
            .cast("bigint")
            .alias("n_mismatch_days"),
        )
        .orderBy("month")
    )
