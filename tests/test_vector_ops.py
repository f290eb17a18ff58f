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


def test_rounded_tie_plateau_keeps_lowest_neighbor_id(spark):
    """>k+8 rows tying at the same rounded cosine in ONE batch: the per-batch
    cut must keep every boundary tie so the global window can pick the lowest
    neighbor_id — the exact failure mode a fixed k+8 unrounded cut had."""
    # 14 collinear vectors (cosine exactly 1.0 to the query) with DESCENDING
    # ids in row order, then the smallest id last; one partition = one batch.
    rows = [(0, [1.0, 0.0, 0.0])]
    rows += [(100 + 13 - i, [float(i + 2), 0.0, 0.0]) for i in range(14)]
    rows += [(50, [9.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1)

    got = cosine_topk_vectorized(emb, query_ids=[0], k=5).collect()
    assert [r["neighbor_id"] for r in got] == [50, 100, 101, 102, 103]
    assert all(r["cosine"] == 1.0 for r in got)


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


def test_brute_branch_auto_switches_to_vectorized(spark):
    """sim_topk_cosine's brute branch must route through the matmul kernel
    above _VECTORIZE_MIN_ROWS, with identical output either way."""
    from etl_for_dumdums_spark.catalog import load_all
    from etl_for_dumdums_spark.catalog.similarity import (
        _VECTORIZE_MIN_ROWS,
        _brute_topk,
    )

    load_all()
    jvm = _brute_topk(spark, SF_SMOKE, vectorize=False).collect()
    vec = _brute_topk(spark, SF_SMOKE, vectorize=True).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
    assert sorted(map(key, jvm)) == sorted(map(key, vec))
    # the auto threshold is a real production value, not accidentally tiny
    assert _VECTORIZE_MIN_ROWS >= 10_000


def test_int8_quantization_roundtrip_error_bound(spark):
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.catalog import Tables
    from etl_for_dumdums_spark.operators.vector import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    from .conftest import SF_SMOKE as _SF

    emb = Tables(spark, _SF).embeddings.limit(500)
    q = dequantize_embeddings(quantize_embeddings(emb))
    err = q.select(
        F.expr(
            "aggregate(zip_with(embedding, deq_vec, (a, b) -> abs(CAST(a AS DOUBLE) - b)),"
            " CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, x))"
        ).alias("max_err"),
        (F.col("q_scale") / 2 + 1e-12).alias("bound"),
    ).collect()
    assert len(err) > 0
    for r in err:
        assert r["max_err"] <= r["bound"], (r["max_err"], r["bound"])
