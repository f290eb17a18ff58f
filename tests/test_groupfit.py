"""Parity proofs for the two Arrow-Python API surfaces: grouped-map
applyInPandas (per-group OLS) and scalar @pandas_udf (token count), each
against its JVM-native twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_for_dumdums_spark.operators.groupfit import fit_user_trends, user_trends_native

from .conftest import SF_SMOKE


def _events(spark):
    from etl_for_dumdums_spark.catalog import Tables

    return Tables(spark, SF_SMOKE).events


def test_applyinpandas_fit_matches_native_twin(spark):
    ev = _events(spark)
    py = {r["user_id"]: r for r in fit_user_trends(ev).collect()}
    jvm = {r["user_id"]: r for r in user_trends_native(ev).collect()}
    assert set(py) == set(jvm) and len(py) > 0
    for uid, p in py.items():
        n = jvm[uid]
        assert p["n_days"] == n["n_days"]
        for col in ("slope", "intercept", "mean_daily"):
            assert math.isclose(p[col], n[col], rel_tol=1e-9, abs_tol=1e-9), (
                uid,
                col,
                p[col],
                n[col],
            )


def test_pandas_udf_token_count_matches_native(spark):
    from etl_for_dumdums_spark.catalog import Tables
    from etl_for_dumdums_spark.functions import token_count_pandas

    docs = Tables(spark, SF_SMOKE).documents.limit(500)
    udf = token_count_pandas()
    got = docs.select(
        "doc_id",
        udf(F.col("text")).alias("py"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("native"),
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r["py"] == r["native"], (r["doc_id"], r["py"], r["native"])


def test_grouped_agg_pandas_udf_matches_native_twin(spark):
    """GROUPED_AGG pandas_udf trimmed mean == the JVM rank-trim twin."""
    from etl_for_dumdums_spark.operators.groupfit import (
        trimmed_mean_grouped_udf,
        trimmed_mean_native,
    )

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    udf_rows = {r.event_type: r.trimmed_mean_value for r in trimmed_mean_grouped_udf(events).collect()}
    nat_rows = {r.event_type: r.trimmed_mean_value for r in trimmed_mean_native(events).collect()}
    assert set(udf_rows) == set(nat_rows) and len(udf_rows) > 1
    for et in udf_rows:
        assert abs(udf_rows[et] - nat_rows[et]) < 1e-9, et
