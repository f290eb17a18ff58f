"""Run the full-catalog oracle sweep in CHUNKS, each in a fresh process.

A single-process sweep over ~180 scale-up oracles accumulates process
memory (Spark JVM native buffers + DuckDB pools + allocator
fragmentation) until even KB-scale mallocs fail on a no-swap box —
observed twice at 100x around query ~55 regardless of DuckDB's own
memory_limit. Chunking restarts the whole lifecycle every N queries, so
each chunk starts from a clean slate; results aggregate to one summary.

Usage:
    python tools/run_oracle_chunked.py --sf /tmp/sfscale100 \
        --exclude a,b,c --chunk-size 40
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_for_dumdums_spark.catalog import EXTRA_QUERIES, QUERIES, load_all  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfscale100")
    ap.add_argument("--exclude", default="")
    ap.add_argument("--chunk-size", type=int, default=40)
    args = ap.parse_args()

    load_all()
    excluded = {n for n in args.exclude.split(",") if n}
    names = sorted(n for n in {**QUERIES, **EXTRA_QUERIES} if n not in excluded)
    chunks = [
        names[i : i + args.chunk_size] for i in range(0, len(names), args.chunk_size)
    ]
    total_pass = total_fail = total_skip = 0
    accounted: set[str] = set()
    crashed_chunks = 0
    here = Path(__file__).resolve().parent
    for i, chunk in enumerate(chunks, 1):
        print(f"--- chunk {i}/{len(chunks)} ({len(chunk)} queries)", flush=True)
        # stream stdout live (a 1000x chunk can run >30 min — a silent
        # capture makes progress unobservable) while still collecting it
        # for the PASS/FAIL accounting below
        proc = subprocess.Popen(
            [sys.executable, str(here / "check_oracle.py"), "--sf", args.sf, *chunk],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        out_lines = []
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            out_lines.append(line)
        _, err = proc.communicate()
        out = "".join(out_lines)
        if proc.returncode not in (0, 1):  # 1 = some FAILs; >1 = crash
            sys.stderr.write((err or "")[-2000:])
            print(f"chunk {i} crashed (rc={proc.returncode})", flush=True)
            crashed_chunks += 1
        for line in out.splitlines():
            parts = line.split()
            if len(parts) >= 2 and parts[0] in ("PASS", "FAIL", "SKIP"):
                accounted.add(parts[1].rstrip(":"))
            if line.startswith("PASS "):
                total_pass += 1
            elif line.startswith("FAIL "):
                total_fail += 1
            elif line.startswith("SKIP "):
                total_skip += 1
    # a crashed chunk's remaining queries produce no PASS/FAIL/SKIP line —
    # name them explicitly so a partial sweep is loud, not inferable from
    # the "of N" denominator alone
    unaccounted = [n for n in names if n not in accounted]
    if unaccounted:
        print(f"UNACCOUNTED ({len(unaccounted)}): {', '.join(unaccounted)}")
    print(
        f"TOTAL: {total_pass} pass, {total_fail} fail, {total_skip} rows-only"
        f" of {len(names)}"
        + (f" ({crashed_chunks} chunk(s) crashed)" if crashed_chunks else "")
    )
    return 1 if (total_fail or unaccounted or crashed_chunks) else 0


if __name__ == "__main__":
    raise SystemExit(main())
