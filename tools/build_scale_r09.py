"""Assemble SCALE_r09.json — the round-9 1000x accounting.

Starts from the consolidated round-8 end state (SCALE_r08.json: 190 full
passes / 1 rows-only / 4 named oracle-capacity fails / zero not_run) and
folds in the round-9 runs:

  * the serialized sampled-tier sweep (scale_logs/oracle1000_r9_sampled.log)
    — all 14 sampled queries, one fresh process each, Spark stopped before
    each oracle leg;
  * the dedup_prefix_jaccard solo adjudication (green after the r9
    positional-filter/collapse/fingerprint rewrite + mod-101 sample);
  * the 3 new sampled-tier variants (text_winnow_sketch,
    text_winnow_neardup, join_cooccurrence_pairs) whose FULL 1000x oracles
    are named exclusions (single-node DuckDB resource deaths, r8) — their
    full-tier fails convert to sampled-tier coverage.

Precedence: round first (an r9 result supersedes r8's for the same query),
then pass-beats-fail within the round's attempt sequence.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent

# full-tier exclusions now covered by the sampled tier (Makefile
# ORACLE_1000X_EXCLUDE + the r9 additions with their reasons)
SAMPLED_TIER = (
    "win_lag_deltas,win_rolling_frames,scalar_string_ops,scalar_math_conditional,"
    "scalar_clean_html,scalar_array_ops,dedup_prefix_jaccard,text_chunk_tokens,"
    "dedup_cc_groups,join_range_interval,text_winnow_sketch,text_winnow_neardup,"
    "join_cooccurrence_pairs,events_sequence_pattern"
).split(",")

# the full serialized sweep + the retry pass (join_range_interval after
# the RANGE-window oracle rewrite; join_cooccurrence_pairs solo at a
# raised DuckDB budget — 40GB/52GiB is safe with Spark stopped first and
# nothing else on the box). Retry log parsed LAST: within-round
# pass-beats-fail upgrades the sweep's two oracle-resource fails.
R9_SAMPLED_LOGS = [
    REPO / "scale_logs/oracle1000_r9_sampled.log",
    REPO / "scale_logs/oracle1000_r9_sampled_retry.log",
]


def parse(paths):
    import re

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
    r8 = json.loads((REPO / "SCALE_r08.json").read_text())

    # full tier: r8 end state, minus fails that moved to the sampled tier
    full_pass = dict(r8["full"]["passes"])
    full_rows_only = dict(r8["full"]["rows_only"])
    full_fail = {
        k: v for k, v in r8["full"]["fails"].items() if k not in SAMPLED_TIER
    }

    # sampled tier: r8 results superseded by r9's (round precedence)
    s9_p, s9_f, _ = parse(R9_SAMPLED_LOGS)
    s9_f = {k: v for k, v in s9_f.items() if k not in s9_p}
    s9_seen = set(s9_p) | set(s9_f)
    sampled_p = {
        k: v for k, v in r8["sampled"]["passes"].items() if k not in s9_seen
    }
    sampled_p.update(s9_p)
    sampled_f = {
        k: v for k, v in r8["sampled"]["fails"].items() if k not in s9_seen
    }
    sampled_f.update(s9_f)

    not_covered = [
        n for n in SAMPLED_TIER if n not in sampled_p and n not in sampled_f
    ]
    out = {
        "round": 9,
        "sf_dir": "/tmp/sfscale1000",
        "rows": r8["rows"],
        "method": (
            "full tier: the consolidated r8 end state (SCALE_r08.json — "
            "chunked serialized full-catalog sweep). Sampled tier re-run in "
            "full in r9: one fresh check_oracle process per query, "
            "SPARK_GRAFT_STOP_SPARK_BEFORE_ORACLE=1 (Spark's shuffle disk "
            "freed before each DuckDB leg), serialized under the sweep "
            "lock. r9 plan changes: winnow doc_id repartition-before-"
            "explode; dedup_prefix_jaccard positional-filter/collapse/"
            "fingerprint rewrite + mod-101 sample (root-caused 2.6B-row "
            "candidate blowup, docs/ROUND9_NOTES.md)."
        ),
        "full": {
            "n_pass": len(full_pass),
            "n_rows_only": len(full_rows_only),
            "n_fail": len(full_fail),
            "n_excluded": len(SAMPLED_TIER),
            "pass_sec_total": round(sum(v["sec"] for v in full_pass.values()), 1),
            "passes": {k: full_pass[k] for k in sorted(full_pass)},
            "rows_only": full_rows_only,
            "rows_only_reason": r8["full"]["rows_only_reason"],
            "fails": full_fail,
            "excluded": SAMPLED_TIER,
            "excluded_reason": (
                "row-scaled full outputs (per-row windows/scalars, "
                "quadratic pair lists) or single-node-oracle-infeasible "
                "full forms (winnow pair, basket pairs, sequence-pattern "
                "full window — 46-94GB DuckDB deaths, r8) — each "
                "value-verified at 1000x through the sampled tier"
            ),
        },
        "sampled": {
            "n_pass": len(sampled_p),
            "n_fail": len(sampled_f),
            "passes": {k: sampled_p[k] for k in sorted(sampled_p)},
            "fails": sampled_f,
            "not_covered": not_covered,
        },
    }
    (REPO / "SCALE_r09.json").write_text(json.dumps(out, indent=1))
    print(
        f"full: {len(full_pass)} pass, {len(full_rows_only)} rows-only, "
        f"{len(full_fail)} fail, {len(SAMPLED_TIER)} excluded; "
        f"sampled: {len(sampled_p)} pass, {len(sampled_f)} fail, "
        f"{len(not_covered)} not covered"
    )
    if sampled_f:
        print("SAMPLED FAILED:", ", ".join(sampled_f))
    if not_covered:
        print("NOT COVERED:", ", ".join(not_covered))


if __name__ == "__main__":
    main()
