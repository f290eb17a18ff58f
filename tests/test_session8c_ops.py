"""Tests for the session-8 warehouse wave: fact-to-SCD2 as-of join, DOW
seasonality, exact per-group mode, freshness audit."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from tests.conftest import SF_SMOKE


def test_fact_to_scd2_exactly_one_interval_and_serial(spark):
    """The in-query tiling proof must hold, and per-band revenue must equal a
    serial interval reconstruction."""
    from etl_for_dumdums_spark.catalog.warehouse import _SCD_BAND, join_fact_to_scd2

    ev = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts), event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) // {_SCD_BAND},
                   CAST(round(value * 100) AS BIGINT)
            FROM '{SF_SMOKE}/events.parquet'
            ORDER BY user_id, epoch_us(ts), event_id"""
    ).fetchall()
    by_user = defaultdict(list)
    for uid, us, eid, et, band, cents in ev:
        by_user[uid].append((us, eid, et, band, cents))
    revenue = Counter()
    n_purch = Counter()
    for uid, rows in by_user.items():
        # build runs in (ts, event_id) order, intervals [run_start, next_run_start)
        runs = []  # (band, start_us)
        for us, eid, et, band, cents in rows:
            if not runs or runs[-1][0] != band:
                runs.append((band, us))
        for us, eid, et, band, cents in rows:
            if et != "purchase":
                continue
            active = None
            for i, (b, start) in enumerate(runs):
                end = runs[i + 1][1] if i + 1 < len(runs) else None
                if start <= us and (end is None or us < end):
                    assert active is None, "interval overlap"
                    active = b
            assert active is not None, "purchase not covered"
            revenue[active] += cents
            n_purch[active] += 1
    got = join_fact_to_scd2(spark, SF_SMOKE).collect()
    assert {r["band"]: r["revenue_cents"] for r in got} == dict(revenue)
    assert {r["band"]: r["n_purchases"] for r in got} == dict(n_purch)
    for r in got:
        assert r["n_unmatched"] == 0 and r["n_multi_match"] == 0


def test_seasonal_dow_matches_serial(spark):
    from etl_for_dumdums_spark.catalog.warehouse import ts_seasonal_dow_profile

    n = Counter()
    s = Counter()
    for et, us, cents in duckdb.sql(
        f"""SELECT event_type, epoch_us(ts), CAST(round(value * 100) AS BIGINT)
            FROM '{SF_SMOKE}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall():
        dow = (us // 86400000000) % 7
        n[(et, dow)] += 1
        s[(et, dow)] += cents
    rows = ts_seasonal_dow_profile(spark, SF_SMOKE).collect()
    assert len(rows) == len(n)
    for r in rows:
        key = (r["event_type"], r["dow"])
        n_et = sum(v for (e, _), v in n.items() if e == key[0])
        s_et = sum(v for (e, _), v in s.items() if e == key[0])
        assert r["n"] == n[key]
        assert r["dow_mean_cents"] == s[key] // n[key]
        assert r["ratio_ppm"] == s[key] * n_et * 1_000_000 // (n[key] * s_et)
    # ratios bracket 1.0 within each event type (some days above, some below)
    by_et = defaultdict(list)
    for r in rows:
        by_et[r["event_type"]].append(r["ratio_ppm"])
    for vals in by_et.values():
        assert min(vals) <= 1_000_000 <= max(vals)


def test_mode_per_group_matches_serial(spark):
    from etl_for_dumdums_spark.catalog.warehouse import agg_mode_per_group

    cnt = Counter()
    for et, k in duckdb.sql(
        f"""SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT)
            FROM '{SF_SMOKE}/events.parquet'"""
    ).fetchall():
        cnt[(et, k)] += 1
    best = {}
    totals = Counter()
    for (et, k), c in cnt.items():
        totals[et] += c
        cur = best.get(et)
        if cur is None or (c, -k) > (cur[1], -cur[0]):
            best[et] = (k, c)
    rows = agg_mode_per_group(spark, SF_SMOKE).collect()
    assert len(rows) == len(best)
    for r in rows:
        k, c = best[r["event_type"]]
        assert (r["mode_k"], r["mode_count"]) == (k, c)
        assert r["mode_share_ppm"] == c * 1_000_000 // totals[r["event_type"]]
        assert r["n_rows"] == totals[r["event_type"]]


def test_freshness_lag_matches_metadata(spark):
    from datetime import date

    from etl_for_dumdums_spark.catalog.warehouse import _FRESH_ASOF, ops_freshness_lag

    rows = {r["table_name"]: r for r in ops_freshness_lag(spark, SF_SMOKE).collect()}
    assert set(rows) == {"events", "lineitem", "orders"}
    asof = date.fromisoformat(_FRESH_ASOF)
    for tbl, col in (("events", "CAST(max(ts) AS DATE)"),
                     ("lineitem", "CAST(max(l_shipdate) AS DATE)"),
                     ("orders", "CAST(max(o_orderdate) AS DATE)")):
        n, mx = duckdb.sql(
            f"SELECT count(*), {col} FROM '{SF_SMOKE}/{tbl}.parquet'"
        ).fetchone()
        r = rows[tbl]
        assert r["n_rows"] == n
        assert r["max_date"] == mx
        assert r["lag_days"] == (asof - mx).days
