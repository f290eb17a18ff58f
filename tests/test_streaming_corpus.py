"""The streaming corpus cleaner must keep exactly the batch cleaner's
surviving content fingerprints (first-arrival winner per group instead of
lowest doc_id — the digest set is the invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.corpus import clean_corpus, fingerprint_expr
from etl_for_dumdums_spark.streaming.corpus import clean_corpus_stream

from .conftest import SF_SMOKE


def test_stream_matches_batch_fingerprints(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").withColumn(
        "ingest_ts",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))),
    )
    stream_dir = str(tmp_path / "docs_stream")
    docs.write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    q = clean_corpus_stream(spark, stream_dir, schema, query_name="t_corpus")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_corpus").collect()
    finally:
        q.stop()

    batch = clean_corpus(docs.drop("ingest_ts")).withColumn("fp", fingerprint_expr()).collect()

    # one stream survivor per batch-surviving fingerprint, same digest set
    assert len(got) == len(batch) > 0
    assert {r["fingerprint"] for r in got} == {r["fp"] for r in batch}
    # every stream survivor passed the same gates
    assert all(r["quality_bucket"] == "ok" and r["predicted_lang"] == "en" for r in got)


def test_stream_drops_duplicate_arrivals(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(200)
        .withColumn("ingest_ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    )
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    stream_dir = str(tmp_path / "dup_docs")
    doubled.write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    q = clean_corpus_stream(spark, stream_dir, schema, query_name="t_dupcorpus")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_dupcorpus").collect()
    finally:
        q.stop()

    # at-least-once delivery collapses: one survivor per fingerprint
    fps = [r["fingerprint"] for r in got]
    assert len(fps) == len(set(fps)) > 0


def test_chunking_streams_unchanged(spark, tmp_path):
    """chunk_by_tokens is a stateless map, so the SAME operator applies to a
    readStream frame with no code changes and no watermark/state — the
    streaming output equals the batch output row-for-row."""
    from etl_for_dumdums_spark.operators.chunking import chunk_by_tokens

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(300)
    stream_dir = str(tmp_path / "chunk_docs")
    docs.write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    stream = spark.readStream.schema(schema).parquet(stream_dir)
    q = (
        chunk_by_tokens(stream)
        .writeStream.format("memory")
        .queryName("t_chunks")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_chunks").collect()
    finally:
        q.stop()

    batch = chunk_by_tokens(spark.read.parquet(stream_dir)).collect()
    key = lambda r: (r.doc_id, r.chunk_id)  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: t[:2]) == sorted(
        map(tuple, batch), key=lambda t: t[:2]
    )
    assert len(batch) > 0
