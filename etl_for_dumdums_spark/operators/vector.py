"""Vectorized similarity search: the Arrow/numpy scale path for ANN.

catalog/similarity.py computes dot products with JVM higher-order functions
(fine at test SF, and exact via integer quantization). At 100 TB the
embedding column is millions of fixed-width vectors per partition, and the
winning layout is: ship Arrow batches to Python, stack them into a numpy
matrix, and do ONE int64 matrix multiply per batch (BLAS, not per-element
exprs), keeping a running per-partition top-k — then reduce the tiny
per-partition candidate sets globally.

Numeric parity: vectors are quantized to int64 (round(x*1000)), identical
to the catalog queries, so the numpy matmul is EXACT integer arithmetic
and results match sim_topk_cosine's brute-force branch bit-for-bit (the
single final sqrt/division is IEEE-deterministic). Verified in
tests/test_vector_ops.py.

Scale design:
  * the query set is collected once (it is small by construction) and
    closed over — each executor gets it via task serialization;
  * mapInPandas streams Arrow batches: memory is O(batch × dim), never
    O(partition);
  * per-batch top-k bounds the shuffle to |queries| × k rows per batch;
  * the final global top-k runs over |partitions| × |queries| × k rows —
    driver-side small, computed with one tiny window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _round_half_away(a):
    """round() in Spark/DuckDB is half-AWAY-from-zero; numpy's rint/round are
    half-even — quantization must match the engines or a .5-boundary vector
    lands in a different integer cell than the catalog queries."""
    import numpy as np

    return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def cosine_topk_vectorized(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id, numpy-vectorized.

    Returns (query_id, rank, neighbor_id, cosine) like the catalog's
    brute-force branch (self-matches excluded, ties broken by neighbor_id).
    """
    import numpy as np

    qrows = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        raise ValueError("no query vectors found for the given ids")
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array(
        [_round_half_away(np.asarray(r[1], dtype=np.float64) * 1000) for r in qrows],
        dtype=np.int64,
    )
    q_norm = (q_mat * q_mat).sum(axis=1)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _round_half_away(
                np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64) * 1000
            ).astype(np.int64)
            norms = (mat * mat).sum(axis=1)
            # ONE integer matmul per Arrow batch: exact, BLAS-speed
            dots = mat @ q_mat.T  # (batch, n_queries)
            cos = dots / np.sqrt(norms[:, None].astype(np.float64) * q_norm[None, :])
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                col = cos[:, j]
                mask = ids != qid  # exclude self-match
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                # per-batch partial top-k (keeps the shuffle tiny). The
                # global window ranks by the ROUNDED cosine with neighbor_id
                # as tie-break, so the local cut must select on the same
                # rounded value and keep EVERY row tying with the k-th one —
                # a fixed k+ε cut on the unrounded cosine could drop the
                # lowest-neighbor_id member of a large rounded-tie plateau.
                scaled = col[cand_idx] * (10.0**round_dp)
                rr = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
                order = np.argsort(-rr, kind="stable")
                kth = rr[order[min(k, len(order)) - 1]]
                top = cand_idx[rr >= kth]
                out_q.extend([qid] * len(top))
                out_n.extend(ids[top].tolist())
                out_c.extend(col[top].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    candidates = embeddings.select(id_col, vec_col).mapInPandas(score, schema=_OUT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        candidates.withColumn("cosine", F.round("cosine", round_dp))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization: per-vector symmetric max-abs scaling — the
# 4x storage cut embedding stores ship (float32 -> int8 + one float scale).
# Pure higher-order column functions (JVM-side, no UDF): quantize computes
# scale = max|x| / 127 and rounds each component; dequantize multiplies
# back. Roundtrip error is bounded by scale/2 per component, pinned by test.
# ---------------------------------------------------------------------------
def quantize_embeddings(df, vec_col: str = "embedding"):
    """Add int8 quantized vector + per-vector scale columns."""
    scale = F.expr(
        f"aggregate({vec_col}, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0"
    )
    out = df.withColumn("q_scale", scale)
    quant = F.expr(
        f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) / q_scale) AS TINYINT))"
    )
    return out.withColumn(
        "q_vec",
        F.when(F.col("q_scale") > 0, quant).otherwise(
            F.expr(f"transform({vec_col}, x -> CAST(0 AS TINYINT))")
        ),
    )


def dequantize_embeddings(df, q_col: str = "q_vec", scale_col: str = "q_scale"):
    """Reconstruct float vectors from int8 + scale."""
    return df.withColumn(
        "deq_vec",
        F.expr(f"transform({q_col}, x -> CAST(x AS DOUBLE) * {scale_col})"),
    )
