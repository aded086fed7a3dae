"""Cross-round bench diff: compare two bench JSON lines (or driver
BENCH_r{N}.json wrappers) per query, warm-pass first.

    python tools/compare_bench.py BENCH_r01.json BENCH_r02.json
    python tools/compare_bench.py old.json new.json --threshold 1.3

Prints a per-query table of warm timings with ratios and flags
regressions above --threshold (exit 1 if any, so it can gate CI). Handles
the driver wrapper format ({"tail": "...{json}..."}) and raw bench.py
output interchangeably. Note BENCH_r01 predates the noop-sink methodology
(SCALING.md "Bench methodology") — r1→r2 ratios for projection-heavy
queries reflect the measurement fix, not regressions; r2 onward is
apples-to-apples.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        raw = f.read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "queries_warm" in obj:
        return obj
    # driver wrapper: the bench JSON line is embedded in "tail"
    hay = obj.get("tail", "") if isinstance(obj, dict) else raw
    m = re.search(r'\{"metric".*\}', hay)
    if not m:
        raise SystemExit(f"{path}: no bench JSON line found")
    return json.loads(m.group(0))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag queries with new/old warm ratio above this")
    ap.add_argument("--min-delta", type=float, default=0.3,
                    help="ignore ratio flags when the absolute delta is below this (s)")
    args = ap.parse_args()

    old, new = load_bench(args.old), load_bench(args.new)
    ow, nw = old["queries_warm"], new["queries_warm"]
    flagged = []
    print(f"{'query':30} {'old_warm':>9} {'new_warm':>9} {'ratio':>6}")
    for name in nw:
        if name not in ow:
            print(f"{name:30} {'-':>9} {nw[name]:9.3f}    new")
            continue
        a, b = ow[name], nw[name]
        ratio = b / max(a, 1e-9)
        flag = ""
        if ratio > args.threshold and (b - a) > args.min_delta:
            flag = "  <-- REGRESSION?"
            flagged.append(name)
        print(f"{name:30} {a:9.3f} {b:9.3f} {ratio:6.2f}{flag}")
    gone = sorted(set(ow) - set(nw))
    if gone:
        print(f"dropped queries: {gone}")
    print(f"\nwarm totals: old {old.get('warm_total')} -> new {new.get('warm_total')}")
    if flagged:
        print(f"FLAGGED: {flagged}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
