"""Flag per-query bench regressions between two bench JSON lines.

    PYTHONPATH=/root/repo python scripts/bench_compare.py BENCH_r01.json current.json [--threshold 1.5]

The co-tenant box swings ±50% on single samples; bench.py already takes
best-of-3 with a load guard, so a sustained >threshold regression on a
best-of-N number is signal, not noise — but re-run before believing it.
Exit code 1 iff any shared query regressed beyond the threshold.
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
    args = ap.parse_args()

    def load(path):
        with open(path) as f:
            d = json.load(f)
        # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
        return d.get("parsed", d)

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(oq.keys() & nq.keys())
    regressed = []
    for name in shared:
        before, after = oq[name], nq[name]
        ratio = after / before if before else float("inf")
        mark = ""
        if ratio > args.threshold:
            regressed.append(name)
            mark = f"  << REGRESSED >{args.threshold}x"
        print(f"{name:45s} {before:8.3f}s -> {after:8.3f}s  ({ratio:5.2f}x){mark}")
    only_new = sorted(nq.keys() - oq.keys())
    if only_new:
        print(f"new queries (no baseline): {', '.join(only_new)}")
    print(
        json.dumps(
            {
                "shared": len(shared),
                "regressed": regressed,
                "old_total": old.get("value"),
                "new_total": new.get("value"),
            }
        )
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
