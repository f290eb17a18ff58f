"""Tests for the last session-7 wave: truncated EWMA and the migration
checksum."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_ewma_matches_serial_weights(spark):
    """EWMA must equal the serial integer dot product over daily means."""
    from collections import defaultdict

    import duckdb

    from etl_for_dumdums_spark.catalog.timeseries import (
        _EWMA_K,
        _EWMA_W,
        ts_ewma_truncated,
    )

    rows = ts_ewma_truncated(spark, SF_SMOKE).collect()
    daily = duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS mean_c
        FROM '{SF_SMOKE}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = defaultdict(list)
    for et, day, mc in daily:
        series[et].append((day, mc))
    expect = {}
    for et, pts in series.items():
        for i, (day, _) in enumerate(pts):
            if i < _EWMA_K - 1:
                continue
            dot = sum(pts[i - j][1] * _EWMA_W[j] for j in range(_EWMA_K))
            expect[(et, day)] = round(dot / sum(_EWMA_W) / 100.0, 4)
    scored = {(r["event_type"], r["day"]): r["ewma"] for r in rows if r["ewma"] is not None}
    assert scored.keys() == expect.keys()
    for k, v in expect.items():
        assert abs(scored[k] - v) < 1e-9, k
    # truncation note: weights keep >= 90% of the geometric mass
    assert sum(_EWMA_W) >= 0.89 * 4_000_000  # Σ(3/4)^i → 4 · 10^6


def test_migration_checksum_detects_value_and_duplicate_changes(spark):
    """XOR catches a changed value; the additive component catches an
    even-multiplicity duplicate that XOR cancels."""
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.catalog.advanced import (
        _CK_MOD,
        _CK_TABLES,
        ops_migration_checksum,
    )

    base = {
        r["table_name"]: r for r in ops_migration_checksum(spark, SF_SMOKE).collect()
    }
    assert set(base) == set(_CK_TABLES)

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    h = F.expr(
        f"CAST(conv(substr(md5({_CK_TABLES['customer']}), 1, 15), 16, 10) AS BIGINT)"
    )

    def fold(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(h).alias("x"),
            F.sum(h % _CK_MOD).alias("a"),
        ).collect()[0]
        return r["n"], r["x"], r["a"]

    n0, x0, a0 = fold(cust)
    assert (n0, x0, a0) == (
        base["customer"]["n_rows"],
        base["customer"]["xor_checksum"],
        base["customer"]["add_checksum"],
    )
    # mutate one value → XOR changes
    mutated = cust.withColumn(
        "c_nationkey",
        F.when(F.col("c_custkey") == 1, F.lit(99)).otherwise(F.col("c_nationkey")),
    )
    _, x1, _ = fold(mutated)
    assert x1 != x0
    # duplicate every row once (even multiplicity) → XOR blind, additive not
    doubled = cust.unionByName(cust)
    n2, x2, a2 = fold(doubled)
    assert x2 == 0  # every hash XORs with itself
    assert n2 == 2 * n0 and a2 == 2 * a0 != a0


def test_join_cardinality_prediction_is_exact(spark):
    from etl_for_dumdums_spark.catalog.advanced import ops_join_cardinality

    row = ops_join_cardinality(spark, SF_SMOKE).collect()[0]
    assert row["prediction_error"] == 0
    assert row["predicted"] == row["actual"] > 0
    # the 1-in-16 sampled estimate should land within 25% on this data
    assert abs(row["sample_err_ppm"]) < 250_000
