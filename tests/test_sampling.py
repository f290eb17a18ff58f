"""Determinism and mixture-math invariants for catalog/sampling.py."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_for_dumdums_spark.catalog.sampling import (
    _MIX_WEIGHTS,
    mix_rebalance_langs,
    sample_stratified_hash,
)
from tests.conftest import SF_SMOKE


def _member(doc_id: int, pct: int) -> bool:
    h = int(hashlib.md5(f"samp:{doc_id}".encode()).hexdigest()[:15], 16)
    return h % 100 < pct


def test_stratified_sample_matches_reference_membership(spark):
    """Spark's kept-count per stratum equals a pure-Python replay of the
    hash-membership rule — the sample is a function of the key alone."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "lang").collect()
    from etl_for_dumdums_spark.catalog.sampling import _DEFAULT_RATE, _STRATA_RATES

    expect: dict[str, int] = {}
    for r in docs:
        pct = _STRATA_RATES.get(r["lang"], _DEFAULT_RATE)
        if _member(r["doc_id"], pct):
            expect[r["lang"]] = expect.get(r["lang"], 0) + 1
    got = {r["lang"]: r["n_kept"] for r in sample_stratified_hash(spark, SF_SMOKE).collect()}
    assert got == expect


def test_membership_stable_under_corpus_growth(spark):
    """Adding rows must not change earlier rows' membership (the property
    rand()-based sampling lacks): membership is keyed, not positional."""
    base = [(i, "en") for i in range(100)]
    grown = base + [(i, "en") for i in range(100, 200)]

    def kept_ids(rows):
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        h = F.expr(
            "CAST(conv(substr(md5(concat('samp:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        return {r["doc_id"] for r in df.filter(h % 100 < 25).collect()}

    a, b = kept_ids(base), kept_ids(grown)
    assert a == {i for i in b if i < 100}


def test_mixture_budget_is_max_feasible(spark):
    """n_after hits the target weights exactly and no language is asked for
    more rows than it has; the binding language keeps ~all of its rows."""
    rows = mix_rebalance_langs(spark, SF_SMOKE).collect()
    assert {r["lang"] for r in rows} == set(_MIX_WEIGHTS)
    total_after = sum(r["n_kept"] for r in rows)
    for r in rows:
        assert r["n_kept"] == r["n_after"] <= r["n_before"]
        # realized weight within 1pp of target (floor granularity)
        assert abs(r["actual_wt"] - r["target_wt"]) < 1.0, r
    # maximality at percent granularity: one full budget cycle (+100) adds
    # w_l rows to every language and must overdraw the binding one
    budget = min(100 * r["n_before"] // r["target_wt"] for r in rows)
    assert any(
        r["target_wt"] * (budget + 100) // 100 > r["n_before"] for r in rows
    )


def test_assign_split_deterministic_and_leakage_free(spark):
    """Same key always lands in the same split (across rows and runs) and
    the split is a pure projection — no shuffle in the plan."""
    from etl_for_dumdums_spark.catalog.sampling import assign_split

    df = spark.createDataFrame([(i % 50, i) for i in range(200)], ["k", "v"])
    out = assign_split(df, "k")
    per_key = out.groupBy("k").agg(F.count_distinct("split").alias("d")).collect()
    assert all(r.d == 1 for r in per_key)  # leakage-free: one split per key
    again = {r.k: r.split for r in assign_split(df, "k").select("k", "split").distinct().collect()}
    first = {r.k: r.split for r in out.select("k", "split").distinct().collect()}
    assert first == again  # reproducible
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_fingerprint_keyed_split_prevents_duplicate_leakage(spark):
    """Duplicate documents must share a split. Keyed on the content
    fingerprint they always do; keyed on doc_id they demonstrably do NOT
    (some duplicate pair straddles train/val/test), which is the leakage
    the fingerprint key exists to prevent."""
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.catalog.sampling import assign_split

    # 200 duplicate pairs: (2i, 2i+1) carry identical text
    rows = [(i, f"duplicate content number {i // 2}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "fp", F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    )

    def spanning(keyed):
        return (
            keyed.groupBy("fp")
            .agg(F.count_distinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .count()
        )

    assert spanning(assign_split(df, "fp")) == 0
    assert spanning(assign_split(df, "doc_id")) > 0
