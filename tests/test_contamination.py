"""Invariants for catalog/contamination.py (values oracle-checked)."""

from __future__ import annotations

from etl_for_dumdums_spark.catalog.contamination import (
    _KMV_K,
    sketch_kmv_overlap,
    text_contamination_check,
)
from tests.conftest import SF_SMOKE


def test_kmv_estimates_in_envelope(spark):
    r = sketch_kmv_overlap(spark, SF_SMOKE).collect()[0]
    assert r["k"] == _KMV_K
    # sketches are full (shingle space >> k), so estimates apply;
    # 4 sigma of 1/sqrt(k) ≈ 25% relative
    for est, exact in [
        (r["est_train"], r["n_train"]),
        (r["est_test"], r["n_test"]),
        (r["est_union"], r["n_union"]),
    ]:
        assert exact > _KMV_K, "sketch not saturated — estimator invalid"
        assert abs(est - exact) / exact < 0.25, (est, exact)
    # set algebra sanity on the exact side
    assert r["n_union"] <= r["n_train"] + r["n_test"]
    assert r["n_inter"] == r["n_train"] + r["n_test"] - r["n_union"]
    assert 0.0 <= r["est_jaccard"] <= 1.0


def test_contamination_consistency(spark):
    r = text_contamination_check(spark, SF_SMOKE).collect()[0]
    assert r["n_train_docs"] > 0 and r["n_test_docs"] > 0
    assert 0 <= r["n_contaminated"] <= r["n_test_docs"]
    assert r["sum_matched"] <= r["sum_shingles"]
    # the synthetic corpus has shared boilerplate: the check must not be vacuous
    assert r["n_contaminated"] > 0


def test_contamination_agrees_with_kmv_intersection(spark):
    """sum_matched counts test-shingle occurrences hitting the train set;
    it can't be positive while the exact intersection is empty, and
    vice versa."""
    kmv = sketch_kmv_overlap(spark, SF_SMOKE).collect()[0]
    cont = text_contamination_check(spark, SF_SMOKE).collect()[0]
    assert (kmv["n_inter"] > 0) == (cont["sum_matched"] > 0)
