"""Full headline bench at a scale replica with a PER-QUERY DuckDB control
and an explicit cold/warm page-cache split (r5 verdict item #1).

Why a separate tool from bench.py:
* each (query, engine) pair runs in a FRESH worker process — the r5 sweep
  lesson (one process accumulating JVM native buffers + DuckDB allocator
  pools until KB-scale mallocs fail at 100x) applies doubly at 1000x;
* COLD timings need the OS page cache dropped (the 16 GB 1000x replica
  fits in RAM, so r5's probe numbers were warm-cache and said so) —
  the orchestrator writes /proc/sys/vm/drop_caches before the cold run;
* the control is per query, so "where does the curve go at 10x the 100x
  flip" is answerable per shape, not just in aggregate.

Per (query, engine): run1 after a cache drop = cold (includes one-off
footer reads + codegen for BOTH engines — the honest cold number), then
two more runs in the same process, min = warm (steady-state plan,
page-cache + process caches hot).

Usage (orchestrator):
    python tools/bench_scale_1000.py --sf /tmp/sfscale1000 \
        --out /tmp/bench1000.json [--skip-cold] [--runs 2]
Worker mode (internal): --single NAME --engine spark|duckdb
Emits one JSON doc at --out and a progress line per query on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402


def drop_page_cache() -> bool:
    """Best-effort OS page-cache drop; returns whether it worked."""
    try:
        subprocess.run(["sync"], check=True)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _worker(sf_dir: str, name: str, engine: str, runs: int) -> None:
    """Time one query in THIS process: run1 (cold if the orchestrator
    dropped caches), then `runs` more; prints one JSON line."""
    if engine == "spark":
        from etl_for_dumdums_spark.catalog import EXTRA_QUERIES, QUERIES, load_all
        from etl_for_dumdums_spark.session import get_spark

        load_all()
        q = {**QUERIES, **EXTRA_QUERIES}[name]
        spark = get_spark("bench-scale")

        def once() -> float:
            t0 = time.time()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

    else:
        import duckdb

        from etl_for_dumdums_spark.catalog import (
            EXTRA_ORACLE,
            ORACLE,
            TABLE_NAMES,
            load_all,
        )

        load_all()
        sql = {**ORACLE, **EXTRA_ORACLE}[name]
        con = duckdb.connect()
        for tname in TABLE_NAMES:
            tpath = f"{sf_dir}/{tname}.parquet"
            src = f"{tpath}/*.parquet" if os.path.isdir(tpath) else tpath
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{src}')")

        def once() -> float:
            t0 = time.time()
            con.execute(sql).fetchall()
            return time.time() - t0

    cold = once()
    warm = min(once() for _ in range(runs)) if runs > 0 else None
    print(json.dumps({"cold": round(cold, 2), "warm": round(warm, 2) if warm else None}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfscale1000")
    ap.add_argument("--out", default="/tmp/bench_scale_1000.json")
    ap.add_argument("--names", default="", help="comma list; default: bench.py HEADLINE")
    ap.add_argument("--runs", type=int, default=2, help="warm runs after the cold one")
    ap.add_argument("--skip-cold", action="store_true", help="no cache drop (all-warm box)")
    ap.add_argument("--single", default="")
    ap.add_argument("--engine", default="spark", choices=("spark", "duckdb"))
    ap.add_argument("--timeout", type=int, default=1800, help="per-worker seconds")
    args = ap.parse_args()

    if args.single:
        _worker(args.sf, args.single, args.engine, args.runs)
        return 0

    names = [n for n in args.names.split(",") if n] or list(HEADLINE)
    here = Path(__file__).resolve()
    results: dict[str, dict] = {}
    cold_supported = True
    for name in names:
        row: dict = {}
        for engine in ("spark", "duckdb"):
            if not args.skip_cold:
                cold_supported = drop_page_cache() and cold_supported
            proc = subprocess.run(
                [
                    sys.executable, str(here), "--single", name, "--engine", engine,
                    "--sf", args.sf, "--runs", str(args.runs),
                ],
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            if proc.returncode != 0:
                row[engine] = {"error": proc.stderr.strip()[-400:] or f"rc={proc.returncode}"}
            else:
                # last stdout line is the worker's JSON (Spark chatter above)
                row[engine] = json.loads(proc.stdout.strip().splitlines()[-1])
            print(f"{name} {engine}: {row[engine]}", file=sys.stderr, flush=True)
        results[name] = row

    def total(engine: str, key: str) -> float | None:
        vals = [r[engine].get(key) for r in results.values() if key in r.get(engine, {})]
        vals = [v for v in vals if v is not None]
        return round(sum(vals), 2) if vals else None

    doc = {
        "sf_dir": args.sf,
        "cold_is_real": cold_supported and not args.skip_cold,
        "method": (
            "fresh process per (query, engine); cold = first run after "
            "sync + drop_caches=3 (includes footer reads + codegen); warm = "
            f"min of {args.runs} follow-up runs in the same process"
        ),
        "queries": results,
        "totals": {
            "spark_cold": total("spark", "cold"),
            "spark_warm": total("spark", "warm"),
            "duckdb_cold": total("duckdb", "cold"),
            "duckdb_warm": total("duckdb", "warm"),
        },
    }
    Path(args.out).write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc["totals"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
