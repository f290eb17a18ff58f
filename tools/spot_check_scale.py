"""Value-check catalog queries against DuckDB ON a scale-up replica.

Unlike tools/check_oracle.py (type-strict hash compare at driver SFs),
this is the big-data spot-checker: it compares sorted row values with
str-fallback equality, bounds DuckDB's memory so an oracle-side blowup
spills (or fails cleanly) instead of taking the box down, and reports
each side's wall time — the Spark-vs-serial-restatement gap IS part of
the evidence (SCALE_r04.json).

Usage:
    python tools/spot_check_scale.py --sf /tmp/sfscale1000 \
        dedup_minhash_lsh win_top_n_per_group
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from etl_for_dumdums_spark.catalog import (  # noqa: E402
    EXTRA_ORACLE,
    EXTRA_QUERIES,
    ORACLE,
    QUERIES,
    SAMPLED_ORACLE,
    SAMPLED_QUERIES,
    TABLE_NAMES,
    load_all,
)
from etl_for_dumdums_spark.session import get_spark  # noqa: E402


def _val_key(v):
    """(type-tag, canonical str) sort/compare key — None-safe (NULL rows no
    longer TypeError out of sorted()) and coercion-safe (int 1 vs str '1'
    no longer false-PASSes via the str() fallback; r4 advice finding #3).
    Numerics share one tag so Decimal/int/float restatements of the same
    value still compare equal, as the old `a == b or str == str` intended."""
    from decimal import Decimal

    if v is None:
        return ("none", "")
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, (int, float, Decimal)):
        try:
            f = float(v)
        except (OverflowError, ValueError):
            return ("num", str(v))
        if isinstance(v, int) and int(f) != v:
            return ("num", str(v))  # beyond float53 precision — keep exact
        # 10 significant digits — the same canonicalization check_oracle
        # uses: at scale-up magnitudes (sums of 600M doubles ~1e12) the two
        # engines' summation orders legitimately differ in the trailing
        # digits; comparing beyond stated precision tests associativity
        # luck, not correctness
        return ("num", f"{f:.10g}")
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(_val_key(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((str(k), _val_key(x)) for k, x in v.items())))
    return (type(v).__name__, str(v))


def _row_key(row):
    return tuple(_val_key(v) for v in row)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfscale1000")
    ap.add_argument("--memory-limit", default="60GB")
    ap.add_argument(
        "--sampled",
        action="store_true",
        help="use the deterministic key-sampled variants (catalog/sampled.py)"
        " where registered — the tier for queries whose full-output oracle"
        " is infeasible at this scale",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    load_all()
    queries = {**QUERIES, **EXTRA_QUERIES}
    oracle = {**ORACLE, **EXTRA_ORACLE}
    if args.sampled:
        import etl_for_dumdums_spark.catalog.sampled  # noqa: F401 (registers)

        queries.update(SAMPLED_QUERIES)
        oracle.update(SAMPLED_ORACLE)
    spark = get_spark("spot-scale")
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{args.memory_limit}'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLE_NAMES:
        p = f"{args.sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    n_fail = 0
    for name in args.names:
        t0 = time.time()
        try:
            sraw = [tuple(r) for r in queries[name](spark, args.sf).collect()]
            t1 = time.time()
            oraw = con.execute(oracle[name]).fetchall()
            t2 = time.time()
            # multiset compare on normalized keys: None-safe sort, no
            # cross-type str() false-passes (r4 advice finding #3)
            skeys = sorted(_row_key(r) for r in sraw)
            okeys = sorted(_row_key(r) for r in oraw)
            ok = skeys == okeys
            n_fail += 0 if ok else 1
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: rows {len(sraw)}/{len(oraw)}"
                f" spark={t1 - t0:.1f}s duckdb={t2 - t1:.1f}s",
                flush=True,
            )
            if not ok:
                diff = [(s, o) for s, o in zip(skeys, okeys) if s != o]
                print("  first diverging normalized rows:", diff[:2])
        except Exception as exc:  # oracle-side OOM etc. — report, keep going
            n_fail += 1
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:200]}", flush=True)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
