"""Assemble SCALE_r08.json — the FINAL full-catalog 1000x accounting.

Folds together:
  * the r7 snapshot (SCALE_r07.json: 87 full + 2 sampled passes),
  * the preserved r7 sweep logs (scale_logs/*.log — ~25 more passes and the
    resource-attributed FAILs from the disk-full window),
  * the r8 sweep logs (/tmp/oracle1000_r8*.log — the 83 formerly-not_run
    queries, the serialized re-runs of the resource casualties with the
    rewritten oracles, and the sampled tier).

Precedence: ROUND FIRST — an r8 result supersedes an r7 one for the same
query (the r8 runs are serialized and post-surgery), so a query that passed
in r7 but failed in r8 is reported FAIL (a real regression must show). Within
a single round's attempt sequence, a later PASS supersedes an earlier FAIL
(serialized re-runs after resource contention). The goal state is zero
not_run: every one of the catalog's queries is pass / rows-only /
sampled-pass / named exclusion / named failure at 600M rows.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent

# full-output row-scaled queries: value-verified at 1000x through the
# deterministic key-sampled tier instead (same list as r6/r7)
SAMPLED_TIER = (
    "win_lag_deltas,win_rolling_frames,scalar_string_ops,scalar_math_conditional,"
    "scalar_clean_html,scalar_array_ops,dedup_prefix_jaccard,text_chunk_tokens,"
    "dedup_cc_groups,join_range_interval"
).split(",")

R7_LOGS = [
    REPO / "scale_logs/oracle1000_part1.log",
    REPO / "scale_logs/oracle1000_part2.log",
    REPO / "scale_logs/oracle1000_back.log",
    REPO / "scale_logs/oracle1000.log",
    REPO / "scale_logs/oracle1000_fix.log",
]
# preserved copies of the volatile /tmp sweep logs (cp'd round 9)
R8_LOGS = sorted((REPO / "scale_logs").glob("oracle1000_r8*.log"))
SAMPLED_LOGS_R7 = [REPO / "scale_logs/oracle1000_sampled_results.log"]
SAMPLED_LOGS_R8 = [REPO / "scale_logs/oracle1000_r8_sampled.log"]


def parse(paths):
    passed, failed, rows_only = {}, {}, {}
    for path in paths:
        txt = path.read_text() if path.exists() else ""
        for m in re.finditer(r"PASS (\S+) \((\d+) rows\) \[([\d.]+)s\]", txt):
            passed[m.group(1)] = {"rows": int(m.group(2)), "sec": float(m.group(3))}
        for m in re.finditer(r"FAIL (\S+?):? (.*)", txt):
            failed[m.group(1)] = m.group(2).strip()[:200]
        for m in re.finditer(
            r"SKIP (\S+?): no oracle \(rows-only: (\d+) rows\) \[([\d.]+)s\]", txt
        ):
            rows_only[m.group(1)] = {"rows": int(m.group(2)), "sec": float(m.group(3))}
    return passed, failed, rows_only


def main():
    from etl_for_dumdums_spark.catalog import EXTRA_QUERIES, QUERIES, load_all

    load_all()
    names = sorted({**QUERIES, **EXTRA_QUERIES})

    r7 = json.loads((REPO / "SCALE_r07.json").read_text())
    # r7 state: snapshot + r7 logs, pass-beats-fail within the round
    r7_pass = dict(r7["full"]["passes"])
    r7_fail = dict(r7["full"]["fails"])
    p, f, _ = parse(R7_LOGS)
    r7_pass.update(p)
    r7_fail.update(f)
    r7_fail = {k: v for k, v in r7_fail.items() if k not in r7_pass}

    # r8 state: pass-beats-fail within the round (serialized re-runs)
    r8_pass, r8_fail, rows_only = parse(R8_LOGS)
    r8_fail = {k: v for k, v in r8_fail.items() if k not in r8_pass and k not in rows_only}

    # ROUND precedence first: any r8 result (pass OR fail) supersedes r7's.
    r8_seen = set(r8_pass) | set(r8_fail) | set(rows_only)
    passed = {k: v for k, v in r7_pass.items() if k not in r8_seen}
    passed.update(r8_pass)
    failed = {k: v for k, v in r7_fail.items() if k not in r8_seen}
    failed.update(r8_fail)

    s7_p = dict(r7["sampled"]["passes"])
    s7_f = dict(r7["sampled"]["fails"])
    p, f, _ = parse(SAMPLED_LOGS_R7)
    s7_p.update(p)
    s7_f.update(f)
    s7_f = {k: v for k, v in s7_f.items() if k not in s7_p}
    s8_p, s8_f, _ = parse(SAMPLED_LOGS_R8)
    s8_f = {k: v for k, v in s8_f.items() if k not in s8_p}
    s8_seen = set(s8_p) | set(s8_f)
    sampled_p = {k: v for k, v in s7_p.items() if k not in s8_seen}
    sampled_p.update(s8_p)
    sampled_f = {k: v for k, v in s7_f.items() if k not in s8_seen}
    sampled_f.update(s8_f)

    not_run = [
        n
        for n in names
        if n not in passed
        and n not in failed
        and n not in rows_only
        and n not in SAMPLED_TIER
    ]
    out = {
        "round": 8,
        "sf_dir": "/tmp/sfscale1000",
        "rows": {
            "lineitem": 600_000_000,
            "orders": 150_000_000,
            "events": 100_000_000,
            "documents": 5_000_000,
            "embeddings": 2_000_000,
        },
        "method": (
            "chunked full-catalog oracle sweep (tools/run_oracle_chunked.py, fresh "
            "process per chunk) at the 1000x key-offset replica; strict value/"
            "schema/rowcount parity vs DuckDB per query. mm_* kernels sampled at "
            "SPARK_GRAFT_MM_MOD=500 (same absolute count as the green 100x sweep). "
            "r8 runs are SERIALIZED (one sweep at a time under the lockfile, DuckDB "
            "spill capped at 30GiB) after r7's concurrent runners filled the disk; "
            "the five 1000x-resource-failed oracles were rewritten to single-pass "
            "materialized plans first (commit ed87b48), each pin-tested equivalent "
            "to its original form at sf0.001/sf0.01 (tests/test_advice_r8.py)."
        ),
        "full": {
            "n_pass": len(passed),
            "n_rows_only": len(rows_only),
            "n_fail": len(failed),
            "n_excluded": len(SAMPLED_TIER),
            "n_not_run": len(not_run),
            "pass_sec_total": round(sum(v["sec"] for v in passed.values()), 1),
            "passes": {k: passed[k] for k in sorted(passed)},
            "rows_only": rows_only,
            "rows_only_reason": (
                "text_compression_ratio has no SQL-expressible oracle (zlib "
                "values) — pytest-pinned; the 1000x run is the rows-only check"
            ),
            "fails": failed,
            "excluded": SAMPLED_TIER,
            "excluded_reason": (
                "identical to the 100x list: full outputs are row-scaled "
                "(per-row windows/scalars, quadratic pair lists) — each is "
                "value-verified at 1000x through the sampled tier instead"
            ),
            "not_run": not_run,
        },
        "sampled": {
            "n_pass": len(sampled_p),
            "n_fail": len(sampled_f),
            "passes": sampled_p,
            "fails": sampled_f,
        },
    }
    (REPO / "SCALE_r08.json").write_text(json.dumps(out, indent=1))
    print(
        f"full: {len(passed)} pass, {len(rows_only)} rows-only, {len(failed)} fail, "
        f"{len(not_run)} not run, {len(SAMPLED_TIER)} excluded; "
        f"sampled: {len(sampled_p)} pass {len(sampled_f)} fail"
    )
    if not_run:
        print("NOT RUN:", ", ".join(not_run))
    if failed:
        print("FAILED:", ", ".join(failed))


if __name__ == "__main__":
    main()
