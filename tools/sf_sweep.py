#!/usr/bin/env python
"""Three-SF oracle sweep — the SF-robustness detector, automated.

Runs the full cross-engine harness (tools/check_correctness.py) at every
fixture SF — sf0.001, sf0.01, sf0.1 — in one command. The sweep is the
cheap detector for the knife-edge class the r7 `text_quality` bug
exemplified: two engines computing bit-identical doubles can still render
`round(x, 4)` differently, and the divergence only surfaces on whichever
SF's data happens to land on the edge. Ties, empty groups, and degenerate
aggregates likewise vary by SF.

Exclusions (documented in SCALING.md / BASELINE.md):
- At sf0.1 the four exact-pair-enumeration certification oracles are
  skipped: their DuckDB floors enumerate every qualifying pair and the
  fixture is pathologically self-similar, so they are quadratic there by
  design (7M+ pairs, minutes of oracle time). They remain fully checked
  at sf0.001 and sf0.01.
- Golden-constant oracles (`-- GOLDEN-CONSTANTS @ sf0.01`) are skipped
  and counted by the harness itself at any other SF.

Each SF runs as a subprocess so Spark/DuckDB state can't leak across
scales. Exit status is nonzero if ANY SF reports a failure. A one-line
JSON summary per SF (and a combined line) goes to stdout for SCALING.md
records.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

# Exact-pair-enumeration certification oracles: quadratic at sf0.1 on the
# self-similar fixture (see bench.py exclusions + SCALING.md). Checked at
# the two smaller SFs.
QUADRATIC_AT_SF01 = [
    "minhash_recall",
    "jaccard_threshold_sweep",
    "anf_hll",
    "neighborhood_function",
]

SUMMARY_RE = re.compile(
    r"(\d+) pass, (\d+) fail, (\d+) rows-only, (\d+) witness-pinned"
    r"(?:, (\d+) golden-sf-skipped)?"
)


def run_sf(sf_dir: str, exclude: list[str], repo: str) -> dict:
    sys.path.insert(0, repo)
    from sentiment_analysis_bigdata_spark.workloads import all_queries

    names = [n for n in all_queries() if n not in set(exclude)]
    cmd = [
        sys.executable,
        os.path.join(repo, "tools", "check_correctness.py"),
        "--sf",
        sf_dir,
        *names,
    ]
    t0 = time.time()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=repo
    )
    out = proc.stdout + proc.stderr
    m = SUMMARY_RE.search(out)
    rec = {
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "n_selected": len(names),
        "n_excluded": len(exclude),
        "excluded": exclude,
        "elapsed_sec": round(time.time() - t0, 1),
        "exit_code": proc.returncode,
    }
    if m:
        rec.update(
            n_pass=int(m.group(1)),
            n_fail=int(m.group(2)),
            n_rows_only=int(m.group(3)),
            n_witness_pinned=int(m.group(4)),
            n_golden_sf_skipped=int(m.group(5) or 0),
        )
    else:
        rec["n_fail"] = -1  # harness crashed before the summary line
        rec["tail"] = out[-2000:]
    # surface the red rows themselves, not just the count
    rec["failures"] = [
        line.strip() for line in out.splitlines() if line.startswith("✗")
    ]
    return rec


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--testdata",
        default="/root/testdata",
        help="directory containing the sf* fixture dirs",
    )
    ap.add_argument(
        "--sfs",
        nargs="*",
        default=["sf0.001", "sf0.01", "sf0.1"],
        help="fixture SFs to sweep",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="optional path to write the combined JSON summary",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    results = []
    for sf in args.sfs:
        sf_dir = os.path.join(args.testdata, sf)
        exclude = QUADRATIC_AT_SF01 if sf == "sf0.1" else []
        print(f"=== sweep {sf} ({'excl ' + ','.join(exclude) if exclude else 'all'}) ===")
        rec = run_sf(sf_dir, exclude, repo)
        print(json.dumps(rec))
        results.append(rec)

    # Fold in the child's exit code as well as the parsed fail count: a
    # harness killed by a signal after printing a "0 fail" summary (or any
    # path where summary and exit code disagree) must not read as green.
    any_fail = any(
        r.get("n_fail", -1) != 0 or r.get("exit_code", 1) != 0 for r in results
    )
    combined = {
        "sweep_ok": not any_fail,
        "sfs": {r["sf"]: {k: r[k] for k in r if k != "sf"} for r in results},
    }
    print(json.dumps(combined))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(combined, fh, indent=1)
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
