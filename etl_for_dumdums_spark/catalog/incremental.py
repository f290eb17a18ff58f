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
