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
    TABLE_NAMES,
    load_all,
)
from etl_for_dumdums_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfscale1000")
    ap.add_argument("--memory-limit", default="60GB")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    load_all()
    queries = {**QUERIES, **EXTRA_QUERIES}
    oracle = {**ORACLE, **EXTRA_ORACLE}
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
            srows = sorted(tuple(r) for r in queries[name](spark, args.sf).collect())
            t1 = time.time()
            orows = sorted(tuple(r) for r in con.execute(oracle[name]).fetchall())
            t2 = time.time()
            ok = len(srows) == len(orows) and all(
                all((a == b) or (str(a) == str(b)) for a, b in zip(x, y))
                for x, y in zip(srows, orows)
            )
            n_fail += 0 if ok else 1
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: rows {len(srows)}/{len(orows)}"
                f" spark={t1 - t0:.1f}s duckdb={t2 - t1:.1f}s",
                flush=True,
            )
            if not ok:
                print("  spark:", srows[:2])
                print("  duck: ", orows[:2])
        except Exception as exc:  # oracle-side OOM etc. — report, keep going
            n_fail += 1
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:200]}", flush=True)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
