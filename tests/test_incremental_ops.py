"""Session-5 catalog additions: incremental batch dedup, bigram coverage,
OHLC resample. Each test pins a semantic property the oracle's value-hash
alone wouldn't localize on failure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_for_dumdums_spark.catalog import Tables
from etl_for_dumdums_spark.catalog.incremental import (
    _BASE_BUCKETS,
    dedup_incremental_batch,
    _fp_spark,
)
from etl_for_dumdums_spark.catalog.sketches import _h_spark
from etl_for_dumdums_spark.catalog.textops import text_bigram_coverage
from etl_for_dumdums_spark.catalog.timeseries import ts_resample_ohlc

from .conftest import SF_SMOKE


def test_incremental_counts_are_a_partition_of_the_batch(spark):
    rows = dedup_incremental_batch(spark, SF_SMOKE).collect()
    assert rows, "non-vacuous: fixture has batch docs in every source"
    for r in rows:
        assert r["n_batch"] == r["n_dup_vs_base"] + r["n_dup_within_batch"] + r["n_kept"]
        assert r["n_kept"] >= 0


def test_incremental_base_precedence_over_within_batch(spark):
    """A batch fingerprint that exists in the base corpus is ALWAYS a
    dup_vs_base drop — duplication within the batch never reclassifies it."""
    t = Tables(spark, SF_SMOKE)
    tagged = t.documents.select(
        "doc_id",
        _fp_spark().alias("fp"),
        (
            F.expr(_h_spark("concat('incr:', CAST(doc_id AS STRING))")) % 10
            < _BASE_BUCKETS
        ).alias("is_base"),
    )
    base_fps = {r["fp"] for r in tagged.filter("is_base").select("fp").distinct().collect()}
    batch = tagged.filter(~F.col("is_base")).collect()
    assert batch, "fixture must produce a non-empty batch"
    n_vs_base = sum(1 for r in batch if r["fp"] in base_fps)
    total_vs_base = sum(
        r["n_dup_vs_base"] for r in dedup_incremental_batch(spark, SF_SMOKE).collect()
    )
    assert total_vs_base == n_vs_base


def test_incremental_survivor_per_fingerprint_is_unique(spark):
    """n_kept counts exactly one survivor per distinct non-base fingerprint."""
    t = Tables(spark, SF_SMOKE)
    tagged = t.documents.select(
        "doc_id",
        _fp_spark().alias("fp"),
        (
            F.expr(_h_spark("concat('incr:', CAST(doc_id AS STRING))")) % 10
            < _BASE_BUCKETS
        ).alias("is_base"),
    )
    base_fps = tagged.filter("is_base").select("fp").distinct()
    fresh_fps = (
        tagged.filter(~F.col("is_base"))
        .join(base_fps, "fp", "left_anti")
        .select("fp")
        .distinct()
        .count()
    )
    total_kept = sum(
        r["n_kept"] for r in dedup_incremental_batch(spark, SF_SMOKE).collect()
    )
    assert total_kept == fresh_fps


def test_bigram_coverage_decile_bounds_and_doc_total(spark):
    rows = text_bigram_coverage(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["coverage_decile"] <= 10
        assert r["n_known_bigrams"] <= r["n_bigrams"]
        # decile 10 ⇔ every doc in the bucket has full coverage, which forces
        # the bucket aggregate to 100% known
        if r["coverage_decile"] == 10:
            assert r["n_known_bigrams"] == r["n_bigrams"]
    t = Tables(spark, SF_SMOKE)
    n_eligible = (
        t.documents.select(
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n")
        )
        .filter(F.col("n") >= 2)
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_eligible


def test_ohlc_bar_invariants_and_wow_delta(spark):
    rows = ts_resample_ohlc(spark, SF_SMOKE).collect()
    assert rows
    prev = {}
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        key = r["event_type"]
        if key in prev:
            assert r["close_delta_wow"] == r["close"] - prev[key]
        else:
            assert r["close_delta_wow"] is None
        prev[key] = r["close"]


def test_ohlc_open_pick_is_deterministic_under_ts_ties(spark):
    """The (ts, value) struct-min rule resolves equal timestamps to the
    smaller value — pin it on a hand-built frame with a tie."""
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 5.0),
            ("a", "2024-01-01 00:00:00", 3.0),
            ("a", "2024-01-02 00:00:00", 9.0),
        ],
        ["event_type", "ts", "value"],
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    got = df.groupBy("event_type").agg(
        F.min(F.struct("ts", "value"))["value"].alias("open"),
        F.max(F.struct("ts", "value"))["value"].alias("close"),
    ).collect()[0]
    assert got["open"] == 3.0
    assert got["close"] == 9.0


def test_random_projection_audit_invariants(spark):
    from etl_for_dumdums_spark.catalog.similarity import (
        _RP_PAIR_MAX_ID,
        _ivecs,
        embed_random_projection,
    )

    rows = embed_random_projection(spark, SF_SMOKE).collect()
    assert rows
    n_vecs = (
        _ivecs(Tables(spark, SF_SMOKE))
        .filter(F.col("vec_id") < _RP_PAIR_MAX_ID)
        .filter(F.col("nrm") > 0)
        .count()
    )
    # every unordered pair lands in exactly one error bucket
    assert sum(r["n_pairs"] for r in rows) == n_vecs * (n_vecs - 1) // 2
    for r in rows:
        assert 0 <= r["err_bucket"] <= 40  # |Δcos| ≤ 2 ⇒ bucket ≤ 40
        assert r["max_err_ppm"] < (r["err_bucket"] + 1) * 50000
    # JL sanity: k=16 gives E|Δcos| ≈ 0.2; require the mean comfortably
    # below chance (uniform over [0,2] would be 1.0)
    total = sum(r["n_pairs"] for r in rows)
    mean_err = sum(r["sum_err_ppm"] for r in rows) / total / 1e6
    assert mean_err < 0.5


def test_random_projection_is_deterministic(spark):
    from etl_for_dumdums_spark.catalog.similarity import embed_random_projection

    r1 = embed_random_projection(spark, SF_SMOKE).collect()
    r2 = embed_random_projection(spark, SF_SMOKE).collect()
    assert r1 == r2


def test_profile_table_single_pass_and_values(spark):
    """profile_table runs as ONE aggregate (no per-column jobs) and its
    stats match independently computed values."""
    from etl_for_dumdums_spark.checks import profile_table

    t = Tables(spark, SF_SMOKE)
    out = profile_table(t.orders).collect()
    assert [r["col_name"] for r in out] == sorted(t.orders.columns)
    ok = {r["col_name"]: r for r in out}
    n = t.orders.count()
    nd = t.orders.select(F.count_distinct("o_orderkey")).collect()[0][0]
    assert ok["o_orderkey"]["n_rows"] == n
    assert ok["o_orderkey"]["n_null"] == 0
    assert ok["o_orderkey"]["n_distinct"] == nd
    # monotone repr: min_repr is repr-of-min, not min-of-repr ("10" < "9")
    mn = t.orders.agg(F.min("o_orderkey")).collect()[0][0]
    assert ok["o_orderkey"]["min_repr"] == str(mn)


def test_profile_table_plan_shape(spark):
    """r9 optimization: the profiler must not plan an Expand (the packed
    multi-count_distinct shape replicated every row once per column into
    one fat aggregate — 4.1 s vs 1.0 s at sf0.1). The shape of record is
    one stats scan + one column-pruned scan per distinct branch (columnar
    pruning makes the per-column scans read the same total bytes as the
    old single scan)."""
    from etl_for_dumdums_spark.checks import profile_table

    t = Tables(spark, SF_SMOKE)
    qe = profile_table(t.orders)._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    assert "Expand" not in plan, "multi-distinct must not plan an Expand"
    n_cols = len(t.orders.columns)
    assert plan.count("Relation") == n_cols + 1


def test_skew_report_accounts_for_every_row(spark):
    from etl_for_dumdums_spark.catalog.advanced import _SKEW_KEYS, ops_skew_report

    rows = {r["key_col"]: r for r in ops_skew_report(spark, SF_SMOKE).collect()}
    t = Tables(spark, SF_SMOKE)
    assert set(rows) == {f"{tb}.{c}" for tb, c in _SKEW_KEYS}
    for tb, c in _SKEW_KEYS:
        r = rows[f"{tb}.{c}"]
        assert r["n_rows"] == getattr(t, tb).count()
        assert r["max_group"] >= r["p99_group"] >= 1.0
        # mean consistency: avg_group is n_rows/n_keys at 4 dp
        assert abs(r["avg_group"] - r["n_rows"] / r["n_keys"]) <= 1e-4
        assert 0 < r["top1_share"] <= 1


def test_length_outliers_match_numpy_median_mad(spark):
    import numpy as np

    from etl_for_dumdums_spark.catalog.textops import _MAD_K, text_length_outliers

    t = Tables(spark, SF_SMOKE)
    lens = {}
    for row in t.documents.select("lang", "n_chars").collect():
        lens.setdefault(row["lang"], []).append(row["n_chars"])
    got = {r["lang"]: r for r in text_length_outliers(spark, SF_SMOKE).collect()}
    assert set(got) == set(lens)
    for lang, xs in lens.items():
        xs = np.array(xs, dtype="float64")
        med = float(np.median(xs))
        mad = float(np.median(np.abs(xs - med)))
        r = got[lang]
        assert abs(r["median_len"] - med) <= 1e-4
        assert abs(r["mad_len"] - mad) <= 1e-4
        assert r["n_outliers"] == int((np.abs(xs - med) > _MAD_K * mad).sum())


def test_minhash_audit_confusion_identities(spark):
    from etl_for_dumdums_spark.catalog.dedup import dedup_minhash_audit

    r = dedup_minhash_audit(spark, SF_SMOKE).collect()[0]
    assert r["n_truth"] > 0 and r["n_cand"] > 0, "audit must be non-vacuous"
    assert r["n_tp"] + r["n_fp"] == r["n_cand"]
    assert r["n_tp"] + r["n_fn"] == r["n_truth"]
    assert 0 <= r["precision"] <= 1 and 0 <= r["recall"] <= 1


def test_temperature_mix_flattens_toward_tail_without_upsampling(spark):
    import math

    from etl_for_dumdums_spark.catalog.sampling import mix_temperature_sample

    rows = mix_temperature_sample(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == r["n_after"] <= r["n_before"], "never upsamples"
        assert r["weight_ppm"] == math.floor(math.sqrt(r["n_before"]) * 1e6)
    # τ=1/2 property: kept-share ratio between any two langs is the sqrt of
    # their size ratio (within integer-floor slack of 1 doc per lang)
    big = max(rows, key=lambda r: r["n_before"])
    small = min(rows, key=lambda r: r["n_before"])
    if big["n_before"] > small["n_before"]:
        expect = math.sqrt(big["n_before"] / small["n_before"])
        got = big["n_after"] / max(small["n_after"], 1)
        assert abs(got - expect) < 0.05 * expect + 1
    # the budget's binding minimum keeps (nearly) everything — the two
    # nested integer floors can each shave at most one doc
    assert any(r["n_after"] >= r["n_before"] - 2 for r in rows)
