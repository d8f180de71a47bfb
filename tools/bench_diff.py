#!/usr/bin/env python
"""Compare two bench JSON artifacts and flag per-query regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Prints queries sorted by ratio (new/old), marks those past the
threshold, and summarizes adds/removals — the per-round regression
gate BENCH_NOTES numbers come from.  Exit code 1 if any query regressed
past the threshold (so CI can gate on it); new/removed queries and
sub-0.3 s slots (noise-dominated) never fail the gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="ignore queries faster than this in BOTH runs (noise)",
    )
    args = ap.parse_args()

    def load(path: str) -> dict:
        """Accept either bench.py's raw JSON line or the driver's
        BENCH_r{N}.json wrapper (bench stdout embedded in 'tail')."""
        d = json.load(open(path))
        if "queries" in d:
            return d
        tail = d.get("tail", "")
        i = tail.rfind('{"metric"')
        if i < 0:
            raise SystemExit(f"{path}: no bench payload found")
        return json.loads(tail[i:].splitlines()[0])

    old = load(args.old)
    new = load(args.new)
    oq = {k: v for k, v in old["queries"].items() if isinstance(v, (int, float))}
    nq = {k: v for k, v in new["queries"].items() if isinstance(v, (int, float))}

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    common = sorted(set(oq) & set(nq))

    rows = []
    for k in common:
        if max(oq[k], nq[k]) < args.min_sec:
            continue
        rows.append((nq[k] / oq[k] if oq[k] > 0 else float("inf"), k))
    rows.sort(reverse=True)

    regressed = []
    print(f"{'ratio':>7}  {'old s':>7}  {'new s':>7}  query")
    for r, k in rows:
        flag = ""
        if r > args.threshold:
            flag = "  <-- REGRESSED"
            regressed.append(k)
        print(f"{r:7.2f}  {oq[k]:7.2f}  {nq[k]:7.2f}  {k}{flag}")

    print(
        f"\ntotals: {old.get('value')} -> {new.get('value')} s "
        f"({len(oq)} -> {len(nq)} queries)"
    )
    if added:
        print(f"added: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    if regressed:
        print(f"\n{len(regressed)} queries past {args.threshold}x: {', '.join(regressed)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
