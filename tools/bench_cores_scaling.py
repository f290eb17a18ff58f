"""Core-count scaling leg for the headline bench at a LARGER scale factor.

Round-9 finding (VERDICT r9, PERF_r09.json `suspect_cpus_ignored`): at sf0.1
every headline query is 0.3-1.5 s and scheduler/JVM-floor-bound, so the
driver's 8-vs-32-core comparison measures the floor, not the plans — the
ratios come out ~1 and the scaling check cries wolf. This tool demonstrates
parallelism where it is measurable: it runs the UNMODIFIED ``bench.py``
(same queries, same noop-sink methodology, same env-var contract) as a
subprocess at a scale replica built by ``tools/make_scale_data.py``, once
per requested core count, and records the per-query core-scaling ratios.

bench.py itself is untouched — its sf0.1 driver contract stays
byte-identical; this is tools/-side measurement only (VERDICT r9 item 2).

Usage:
    python tools/make_scale_data.py --src /root/testdata/sf0.1 \
        --out /tmp/sfscale10 --factor 10
    python tools/bench_cores_scaling.py --sf /tmp/sfscale10 \
        --cpus 8,32 --out plans/r10/scaling_sf1.json [--control]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def read_steal() -> tuple[int, int]:
    """(user+sys ticks, steal ticks) from /proc/stat — to bracket each run."""
    parts = Path("/proc/stat").read_text().splitlines()[0].split()
    vals = list(map(int, parts[1:]))
    return vals[0] + vals[2], vals[7] if len(vals) > 7 else 0


def run_bench(sf_dir: str, cpus: int, control: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    if not control:
        env["SPARK_GRAFT_BENCH_CONTROL"] = "0"
    busy0, steal0 = read_steal()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    wall = time.time() - t0
    busy1, steal1 = read_steal()
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not line:
        raise SystemExit(
            f"bench.py failed at cpus={cpus} rc={proc.returncode}:\n{proc.stderr[-2000:]}"
        )
    parsed = json.loads(line[-1])
    parsed["_wall_sec"] = round(wall, 1)
    parsed["_steal_share"] = round(
        (steal1 - steal0) / max(busy1 - busy0 + steal1 - steal0, 1), 3
    )
    return parsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--out", required=True)
    ap.add_argument("--control", action="store_true",
                    help="also run the in-process DuckDB control per leg")
    args = ap.parse_args()

    legs = {}
    for c in [int(x) for x in args.cpus.split(",")]:
        print(f"== bench.py at cpus={c} sf={args.sf}", file=sys.stderr)
        legs[c] = run_bench(args.sf, c, args.control)
        print(
            f"   total {legs[c]['value']} s  (wall {legs[c]['_wall_sec']} s, "
            f"steal {legs[c]['_steal_share']})",
            file=sys.stderr,
        )

    cores = sorted(legs)
    lo, hi = cores[0], cores[-1]
    ratios = {
        q: round(legs[lo]["queries"][q] / max(legs[hi]["queries"][q], 1e-9), 2)
        for q in legs[hi]["queries"]
    }
    doc = {
        "sf_dir": args.sf,
        "cpus": cores,
        "legs": {str(c): legs[c] for c in cores},
        "per_query_ratio_low_over_high": ratios,
        "total_ratio_low_over_high": round(
            legs[lo]["value"] / max(legs[hi]["value"], 1e-9), 2
        ),
        "note": (
            "ratio > 1 means the query runs faster with more cores "
            f"({lo} vs {hi}); bench.py unmodified, env-var contract only"
        ),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(doc, indent=2, sort_keys=True) + "\n")
    print(json.dumps({"out": str(out), "total_ratio": doc["total_ratio_low_over_high"]}))


if __name__ == "__main__":
    main()
