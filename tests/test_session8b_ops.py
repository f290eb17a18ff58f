"""Tests for the session-8 feature-engineering wave: hashing-trick
vectorizer, K-fold target encoding, JSON schema census, linear attribution.

Serial-Python references throughout (the DuckDB oracle is checked separately
by check_oracle); plus the per-row encode helper and in-query proofs.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from tests.conftest import SF_SMOKE


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hash_vectorizer_matches_serial(spark):
    from etl_for_dumdums_spark.catalog.features import _FH_B, feat_hash_vectorizer

    hits: Counter = Counter()
    sums: Counter = Counter()
    terms = defaultdict(set)
    n_tokens = 0
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall():
        for w in text.strip().lower().split():
            h = _h(w)
            b = h % _FH_B
            s = 1 if (h // _FH_B) % 2 == 0 else -1
            hits[b] += 1
            sums[b] += s
            terms[b].add(w)
            n_tokens += 1
    rows = feat_hash_vectorizer(spark, SF_SMOKE).collect()
    assert {r["bucket"] for r in rows} == set(hits)
    for r in rows:
        b = r["bucket"]
        assert r["n_hits"] == hits[b]
        assert r["feat_sum"] == sums[b]
        assert r["n_terms"] == len(terms[b])
    # census is exhaustive: every token instance lands in exactly one bucket
    assert sum(r["n_hits"] for r in rows) == n_tokens


def test_target_encode_kfold_is_leakage_safe(spark):
    """Every (category, fold) mean must be computable from OUT-of-fold rows
    only — recomputed from raw orders serially."""
    from etl_for_dumdums_spark.catalog.features import _TE_K, feat_target_encode_kfold

    raw = duckdb.sql(
        f"""SELECT o_orderpriority, o_orderkey % {_TE_K},
                   CAST(round(o_totalprice * 100) AS BIGINT)
            FROM '{SF_SMOKE}/orders.parquet'"""
    ).fetchall()
    n = Counter()
    s = Counter()
    for cat, fold, cents in raw:
        n[(cat, fold)] += 1
        s[(cat, fold)] += cents
    rows = feat_target_encode_kfold(spark, SF_SMOKE).collect()
    cats = {c for c, _ in n}
    assert len(rows) == len(n)
    for r in rows:
        cat, fold = r["category"], r["fold"]
        n_cat = sum(v for (c, _), v in n.items() if c == cat)
        s_cat = sum(v for (c, _), v in s.items() if c == cat)
        oof_n = n_cat - n[(cat, fold)]
        oof_s = s_cat - s[(cat, fold)]
        assert r["n_rows"] == n[(cat, fold)]
        assert r["oof_mean_cents"] == oof_s // oof_n
        assert r["full_mean_cents"] == s_cat // n_cat
        assert r["leakage_gap_cents"] == oof_s // oof_n - s_cat // n_cat
    assert cats == {r["category"] for r in rows}


def test_encode_with_oof_means_materializes_per_row(spark):
    from pyspark.sql import functions as F

    from etl_for_dumdums_spark.catalog.features import (
        _TE_K,
        encode_with_oof_means,
        feat_target_encode_kfold,
    )

    cells = feat_target_encode_kfold(spark, SF_SMOKE)
    facts = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select(
            F.col("o_orderpriority").alias("category"),
            (F.col("o_orderkey") % _TE_K).cast("long").alias("fold"),
            "o_orderkey",
        )
    )
    enc = encode_with_oof_means(facts, cells)
    assert enc.where(F.col("oof_mean_cents").isNull()).count() == 0
    assert enc.count() == facts.count()


def test_json_schema_census_shapes(spark):
    from etl_for_dumdums_spark.catalog.features import ops_json_schema_infer

    rows = {(r["source"], r["key"]): r for r in ops_json_schema_infer(spark, SF_SMOKE).collect()}
    n_events = duckdb.sql(f"SELECT count(*) FROM '{SF_SMOKE}/events.parquet'").fetchone()[0]
    n_orders = duckdb.sql(f"SELECT count(*) FROM '{SF_SMOKE}/orders.parquet'").fetchone()[0]
    n_big = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/orders.parquet' WHERE o_totalprice > 150000"
    ).fetchone()[0]

    k = rows[("events.props", "k")]
    assert k["n_present"] == n_events and k["fill_ppm"] == 1_000_000
    assert k["n_int"] == n_events and k["n_bool"] == 0 and k["n_str"] == 0

    big = rows[("orders.synth", "big")]
    assert big["n_present"] == n_big and big["n_bool"] == n_big
    assert big["fill_ppm"] == n_big * 1_000_000 // n_orders < 1_000_000

    prio = rows[("orders.synth", "prio")]
    assert prio["n_str"] == n_orders and prio["n_int"] == 0

    # type histogram partitions presence for every key
    for r in rows.values():
        assert r["n_int"] + r["n_float"] + r["n_bool"] + r["n_str"] == r["n_present"]


def test_attribution_conserves_value_and_matches_serial(spark):
    from etl_for_dumdums_spark.catalog.features import (
        _ATTR_WINDOW_US,
        events_attribution_linear,
    )

    ev = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts), event_type,
                   CAST(round(value * 100) AS BIGINT) * 1000000
            FROM '{SF_SMOKE}/events.parquet'
            WHERE event_type IN ('purchase', 'view')"""
    ).fetchall()
    views = defaultdict(list)
    for uid, us, et, _ in ev:
        if et == "view":
            views[uid].append(us)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for uid, pus, et, vmicro in ev:
        if et != "purchase":
            continue
        wk = pus // (86400000000 * 7)
        nv = sum(1 for vus in views[uid] if pus - _ATTR_WINDOW_US <= vus < pus)
        a = agg[wk]
        a[0] += 1
        a[2] += vmicro
        if nv > 0:
            a[1] += 1
            a[3] += (vmicro // nv) * nv
            a[4] += vmicro - (vmicro // nv) * nv
        else:
            a[5] += vmicro
    rows = events_attribution_linear(spark, SF_SMOKE).collect()
    assert {r["week_bucket"] for r in rows} == set(agg)
    for r in rows:
        np, na, vm, cm, rm, um = agg[r["week_bucket"]]
        assert (
            r["n_purchases"],
            r["n_attributed"],
            r["value_micro"],
            r["credited_micro"],
            r["remainder_micro"],
            r["unattributed_micro"],
        ) == (np, na, vm, cm, rm, um)
        assert r["conservation_diff"] == 0
    # non-vacuous: some purchases attributed, some not, remainder nonzero
    assert any(r["n_attributed"] > 0 for r in rows)
    assert any(r["remainder_micro"] > 0 for r in rows)


def test_abtest_srm_matches_serial(spark):
    """Variant counts, conversion ppm, and the collapsed SRM chi-square must
    equal the serial integer arithmetic; both variants carry the identical
    SRM stat (algebraic identity of the 50/50 two-cell chi-square)."""
    from etl_for_dumdums_spark.catalog.behavior import (
        _SRM_CRIT_MILLIONTHS,
        events_abtest_srm,
    )

    users = set()
    conv = set()
    for uid, et in duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall():
        users.add(uid)
        if et == "purchase":
            conv.add(uid)
    by_var = defaultdict(lambda: [0, 0])
    for uid in users:
        v = by_var[uid % 2]
        v[0] += 1
        if uid in conv:
            v[1] += 1
    t = len(users)
    rows = events_abtest_srm(spark, SF_SMOKE).collect()
    assert len(rows) == 2
    stats = set()
    for r in rows:
        n, c = by_var[r["variant"]]
        assert (r["n_users"], r["n_converted"]) == (n, c)
        assert r["conv_ppm"] == c * 1_000_000 // n
        assert r["srm_stat_millionths"] == (2 * n - t) ** 2 * 1_000_000 // t
        assert r["srm_pass"] == (r["srm_stat_millionths"] < _SRM_CRIT_MILLIONTHS)
        stats.add(r["srm_stat_millionths"])
    assert len(stats) == 1  # identical on both rows by algebra
