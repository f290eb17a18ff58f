"""Round-10 optimization equivalence pins: every plan/algorithm rewrite this
round is pinned against its original formulation (real data + synthetic edge
cases), same protocol as tests/test_optimization_r09.py."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# IVF: driver-side numpy Lloyd's trainer vs the MLlib k-means|| path.
# Full-probe (nprobe = k) IVF output is mathematically the brute-force
# top-k for ANY centroid set, so the two trainers must produce identical
# query results even though their centroids differ.
# ---------------------------------------------------------------------------
def test_local_and_mllib_trainers_identical_full_probe(spark):
    pytest.importorskip("pyspark.ml.clustering")
    from etl_for_dumdums_spark.operators.ivf import ivf_topk, train_ivf_index

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = list(range(6))
    out = {}
    for trainer in ("local", "mllib"):
        assigned, cents = train_ivf_index(
            emb, k=4, seed=7, trainer=trainer,
            train_on=emb.filter("vec_id < 2000"),
        )
        assert len(cents) == 4
        out[trainer] = ivf_topk(
            emb, assigned, queries, k=5, nprobe=4, centroids=cents
        ).collect()
    assert out["local"] == out["mllib"]


def test_local_trainer_deterministic_and_assignment_consistent(spark):
    from etl_for_dumdums_spark.operators.ivf import train_ivf_index

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a1, c1 = train_ivf_index(emb, k=4, seed=7, trainer="local")
    # repartitioned input: the driver-side sample sort makes the draw
    # order (hence centroids) partitioning-independent
    a2, c2 = train_ivf_index(emb.repartition(7), k=4, seed=7, trainer="local")
    assert c1 == c2
    assert a1.orderBy("vec_id").collect() == a2.orderBy("vec_id").collect()
    # every vector lands in exactly one bucket in [0, k)
    import pyspark.sql.functions as F

    stats = a1.agg(
        F.count("*").alias("n"),
        F.count_distinct("vec_id").alias("d"),
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
    ).collect()[0]
    assert stats["n"] == stats["d"] == emb.count()
    assert 0 <= stats["lo"] and stats["hi"] <= 3


# ---------------------------------------------------------------------------
# Connected components: large-star/small-star contraction vs the r9
# min-label propagation. Same fixpoint (node -> component minimum) on real
# candidate graphs and synthetic chain/star/cycle shapes; round count on a
# long chain is logarithmic in the diameter (the point of the rewrite).
# ---------------------------------------------------------------------------
def _pairs(spark, lst):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in lst], "da long, db long"
    ).distinct()


def _labels(df):
    return sorted((r["node"], r["lbl"]) for r in df.collect())


def test_cc_star_matches_minlabel_on_synthetic_graphs(spark):
    from etl_for_dumdums_spark.catalog.dedup import (
        _cc_labels_minlabel,
        _cc_labels_star,
    )

    cases = {
        # chain short enough for min-label's _CC_MAX_ITERS to converge
        "chain20": [(i, i + 1) for i in range(20)],
        "star": [(500, 500 + i) for i in range(1, 40)] + [(7, 500)],
        "cycle+2comp": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)],
        "single_edge": [(42, 7)],
    }
    for name, edges in cases.items():
        cand = _pairs(spark, edges)
        assert _labels(_cc_labels_star(cand)) == _labels(
            _cc_labels_minlabel(cand)
        ), name


def test_cc_star_matches_minlabel_on_real_candidates(spark):
    from etl_for_dumdums_spark.catalog.dedup import (
        _cc_labels_minlabel,
        _cc_labels_star,
        _minhash_candidates,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    cand = _minhash_candidates(docs).cache()
    assert _labels(_cc_labels_star(cand)) == _labels(_cc_labels_minlabel(cand))


def test_cc_star_logarithmic_rounds_on_long_chain(spark):
    import math

    from etl_for_dumdums_spark.catalog.dedup import _cc_labels_star

    # diameter 255 — min-label would need 255 propagation rounds (beyond
    # its own _CC_MAX_ITERS cap); star contraction needs ~log2 rounds
    # (+1 round that verifies no change)
    cand = _pairs(spark, [(i, i + 1) for i in range(255)])
    iters: list[int] = []
    lbls = _labels(_cc_labels_star(cand, iters))
    assert lbls == [(i, 0) for i in range(256)]  # one component rooted at 0
    assert iters[0] <= math.ceil(math.log2(255)) + 1, iters


def test_local_trainer_cap_raises(spark):
    from etl_for_dumdums_spark.operators import ivf

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    orig = ivf._LOCAL_TRAIN_CAP
    ivf._LOCAL_TRAIN_CAP = 10  # force the driver-memory guard
    try:
        with pytest.raises(ValueError, match="bounded train_on"):
            ivf.train_ivf_index(emb, k=4, seed=7, trainer="local")
    finally:
        ivf._LOCAL_TRAIN_CAP = orig
