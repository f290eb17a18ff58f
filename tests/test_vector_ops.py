"""The numpy-vectorized ANN path must match the catalog's exact brute-force
branch bit-for-bit (same int64 quantization, same tie-breaks)."""

from __future__ import annotations

from etl_for_dumdums_spark.operators.vector import cosine_topk_vectorized

from .conftest import SF_SMOKE


def _brute_reference(spark):
    from etl_for_dumdums_spark.catalog import load_all
    from etl_for_dumdums_spark.catalog.similarity import _brute_topk

    load_all()
    return _brute_topk(spark, SF_SMOKE)


def test_vectorized_matches_exact_brute_force(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = cosine_topk_vectorized(emb, query_ids=list(range(10)), k=5).collect()
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in _brute_reference(spark).collect()
    )
    assert sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in got) == want
    assert len(got) == 10 * 5


def test_vectorized_streams_small_batches(spark):
    # repartitioned input exercises per-partition partial top-k + global merge
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").repartition(8)
    got = cosine_topk_vectorized(emb, query_ids=[3, 7], k=3).collect()
    assert len(got) == 2 * 3
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ranks == [1, 2, 3]
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
