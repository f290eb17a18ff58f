"""Streaming twin of the corpus cleaner (operators/corpus.py).

The batch pipeline's stages map onto Structured Streaming as:

  * language/quality gates — stateless column expressions, reused verbatim
    (operators/corpus.gate_documents, the same plan fragment);
  * exact + fingerprint dedup — ONE ``dropDuplicatesWithinWatermark`` on
    the sorted-token fingerprint digest: exact duplicates always share the
    fingerprint, so the single digest subsumes both batch dedup stages.
    State is bounded to the keys inside the watermark window — the
    requirement for an unbounded stream (batch keeps the lowest doc_id;
    the stream keeps the FIRST ARRIVAL per digest — same survivor set of
    digests, arrival-order winner within each group);
  * MinHash near-dup — deliberately NOT streamed: banded LSH needs a
    corpus-wide bucket self-join; at stream time it runs as a periodic
    batch compaction over the deduped sink (the standard lambda split).

Tests drive this with the memory sink + processAllAvailable and assert the
kept fingerprint set matches the batch cleaner's stage exactly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.corpus import fingerprint_expr, gate_documents


def clean_corpus_stream(
    spark: SparkSession,
    path: str,
    schema,
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
    query_name: str = "corpus_cleaned",
) -> StreamingQuery:
    """Gate + dedup a document stream with bounded state; emits
    (doc_id, text, predicted_lang, n_tokens, quality_bucket, fingerprint)
    append-mode rows, one per surviving content fingerprint."""
    docs = spark.readStream.schema(schema).parquet(path)
    gated = gate_documents(docs, keep_langs, min_tokens)
    deduped = (
        gated.withColumn("fingerprint", fingerprint_expr())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select(
            "doc_id", "text", "predicted_lang", "n_tokens", "quality_bucket", "fingerprint"
        )
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
