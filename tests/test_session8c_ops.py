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


def test_reachability_matches_serial_bfs(spark):
    """The recursive-CTE closure must equal a serial BFS over the same top-5
    out-edge graph (min-hop semantics, 3-hop bound)."""
    from etl_for_dumdums_spark.catalog.graph import (
        _REACH_HOPS,
        _REACH_TOPK,
        graph_reachability_recursive,
    )

    edges_w = duckdb.sql(
        f"""SELECT s.s_nationkey, c.c_nationkey, count(*)
            FROM '{SF_SMOKE}/lineitem.parquet' l
            JOIN '{SF_SMOKE}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            JOIN '{SF_SMOKE}/customer.parquet' c ON o.o_custkey = c.c_custkey
            JOIN '{SF_SMOKE}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2"""
    ).fetchall()
    out = defaultdict(list)
    for src, dst, w in edges_w:
        if src != dst:
            out[src].append((-w, dst))
    adj = {s: [d for _, d in sorted(v)[:_REACH_TOPK]] for s, v in out.items()}
    rows = {r["src"]: r for r in graph_reachability_recursive(spark, SF_SMOKE).collect()}
    assert set(rows) == set(adj)
    for src, nbrs in adj.items():
        # BFS to min-hop, capped at _REACH_HOPS
        hop = {d: 1 for d in nbrs}
        frontier = list(nbrs)
        for h in range(2, _REACH_HOPS + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v != src and v not in hop:
                        hop[v] = h
                        nxt.append(v)
            frontier = nxt
        r = rows[src]
        assert r["n_reach_h1"] == sum(1 for h in hop.values() if h <= 1)
        assert r["n_reach_h2"] == sum(1 for h in hop.values() if h <= 2)
        assert r["n_reach_h3"] == len(hop)
        assert r["sum_min_hops"] == sum(hop.values())


def test_rank_distributions_match_serial(spark):
    from etl_for_dumdums_spark.catalog.advanced import win_rank_distributions

    cust = duckdb.sql(
        f"""SELECT c_mktsegment, c_acctbal, c_custkey
            FROM '{SF_SMOKE}/customer.parquet'
            ORDER BY c_mktsegment, c_acctbal, c_custkey"""
    ).fetchall()
    by_seg = defaultdict(list)
    for seg, bal, key in cust:
        by_seg[seg].append((bal, key))
    rows = {r["segment"]: r for r in win_rank_distributions(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_seg)
    for seg, vals in by_seg.items():
        n = len(vals)
        bals = [b for b, _ in vals]
        med_idx = (n + 1) // 2 - 1  # row_number (n+1) DIV 2, 0-based
        med_bal = bals[med_idx]
        rnk = bals.index(med_bal) + 1  # rank = first position of the peer group
        n_le = len([b for b in bals if b <= med_bal])
        r = rows[seg]
        assert r["n_customers"] == n
        assert r["n_distinct_bal"] == len(set(bals))
        assert r["max_rank"] == bals.index(max(bals)) + 1
        assert r["median_pct_rank_ppm"] == (rnk - 1) * 1_000_000 // (n - 1)
        assert r["median_cume_ppm"] == n_le * 1_000_000 // n
