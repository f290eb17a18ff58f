"""End-to-end corpus cleaning: the training-data pipeline the individual
operators exist for, composed as one lazy DataFrame plan.

    raw documents
      → language ID (marker-hit argmax, catalog/textops.py semantics)
      → quality gate (length / stopword / type-token heuristics)
      → exact dedup (md5 digest, keep lowest doc_id)
      → near-dup drop (sorted-token fingerprint, keep lowest doc_id)
      → cleaned corpus + per-stage attrition report

Everything is native column expressions + two digest group-bys — a single
pipeline whose shuffle count does not depend on corpus size (2 digest
shuffles + 1 final report aggregation), so it runs unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}


def _hits(lang: str):
    pat = r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), F.lit(0)))


def clean_corpus(
    documents: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
) -> DataFrame:
    """Return the cleaned corpus with per-row provenance columns:
    (doc_id, text, predicted_lang, n_tokens, quality_bucket).

    Drop order mirrors production pipelines: cheap row-local gates first
    (language, quality — pure column ops, no shuffle), content dedup last
    (the only shuffles, over already-reduced data)."""
    hits = {lg: _hits(lg) for lg in _LANG_MARKERS}
    predicted = (
        F.when(
            (hits["en"] == 0) & (hits["de"] == 0) & (hits["fr"] == 0) & (hits["es"] == 0),
            "unknown",
        )
        .when((hits["de"] > hits["en"]) & (hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), "de")
        .when((hits["fr"] > hits["en"]) & (hits["fr"] >= hits["es"]), "fr")
        .when(hits["es"] > hits["en"], "es")
        .otherwise("en")
    )
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_types = F.size(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
    quality = (
        F.when(n_tokens < min_tokens, "too_short")
        .when(hits["en"] * 100 < n_tokens, "no_stopwords")
        .when(n_types * 10 < n_tokens * 3, "repetitive")
        .otherwise("ok")
    )
    gated = (
        documents.withColumn("predicted_lang", predicted)
        .withColumn("n_tokens", n_tokens)
        .withColumn("quality_bucket", quality)
        .filter(F.col("predicted_lang").isin(*keep_langs) & (F.col("quality_bucket") == "ok"))
    )
    # exact dedup: keep the lowest doc_id per raw-text digest
    w_exact = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = gated.withColumn("_rn", F.row_number().over(w_exact)).filter(F.col("_rn") == 1)
    # near-dup (reorder-robust): sorted distinct token-set fingerprint
    fp = F.md5(
        F.concat_ws(
            " ", F.sort_array(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
        )
    )
    w_fp = Window.partitionBy(fp).orderBy("doc_id")
    return (
        exact.withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "text", "predicted_lang", "n_tokens", "quality_bucket")
    )


def attrition_report(documents: DataFrame, cleaned: DataFrame) -> DataFrame:
    """One-row keep/drop accounting for the pipeline run."""
    total = documents.agg(F.count("*").alias("n_raw"))
    kept = cleaned.agg(F.count("*").alias("n_kept"))
    return (
        total.crossJoin(F.broadcast(kept))
        .withColumn("n_dropped", F.col("n_raw") - F.col("n_kept"))
        .withColumn(
            "keep_rate_pct", F.round(F.lit(100.0) * F.col("n_kept") / F.col("n_raw"), 2)
        )
    )
