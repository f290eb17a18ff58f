"""Token-shard packing must equal the serial cumulative-sum rule exactly
and satisfy the packing invariants (conservation, contiguity, budget)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.packing import assign_token_shards

from .conftest import SF_SMOKE

BUDGET = 5000


def _docs(spark):
    from etl_for_dumdums_spark.catalog import Tables

    docs = Tables(spark, SF_SMOKE).documents
    return docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens")
    )


def test_matches_serial_cumsum(spark):
    d = _docs(spark)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in assign_token_shards(d, "doc_id", "n_tokens", BUDGET).collect()
    }
    rows = sorted(
        ((r["doc_id"], r["n_tokens"]) for r in d.collect()), key=lambda x: x[0]
    )
    cum = 0
    for doc_id, n in rows:
        cum += n
        assert got[doc_id] == (cum - 1) // BUDGET, (doc_id, got[doc_id], cum)
    assert len(got) == len(rows) and len(got) > 0


def test_packing_invariants(spark):
    d = _docs(spark)
    out = assign_token_shards(d, "doc_id", "n_tokens", BUDGET)
    stats = (
        out.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
        .collect()
    )
    shard_ids = sorted(r["shard_id"] for r in stats)
    assert shard_ids == list(range(len(shard_ids)))  # contiguous from 0
    max_doc = d.agg(F.max("n_tokens")).collect()[0][0]
    for r in stats:
        assert r["tok"] < BUDGET + max_doc  # budget + one boundary doc
    # shard ids are monotone in doc order
    seq = [r["shard_id"] for r in out.orderBy("doc_id").collect()]
    assert all(a <= b for a, b in zip(seq, seq[1:]))
