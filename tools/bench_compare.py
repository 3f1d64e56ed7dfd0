"""Compare two bench JSON artifacts per query.

Usage: python tools/bench_compare.py OLD.json NEW.json [--top N]
Prints the biggest absolute deltas (improvements and regressions) and
the totals, so a round's claimed wins are checkable in one place.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    a = json.load(open(args.old))["queries"]
    b = json.load(open(args.new))["queries"]
    both = sorted(set(a) & set(b), key=lambda q: b[q] - a[q])
    rows = [q for q in both if abs(a[q] - b[q]) > 0.15]
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    print("--- biggest improvements ---")
    for q in [q for q in rows if b[q] < a[q]][: args.top]:
        print(f"{q:42s} {a[q]:8.2f} {b[q]:8.2f} {b[q]-a[q]:+8.2f}")
    print("--- regressions (new slower by >0.15s) ---")
    for q in [q for q in rows[::-1] if b[q] > a[q]][: args.top]:
        print(f"{q:42s} {a[q]:8.2f} {b[q]:8.2f} {b[q]-a[q]:+8.2f}")
    ta, tb = sum(a[q] for q in both), sum(b[q] for q in both)
    print(f"TOTAL (common {len(both)}): {ta:.1f} -> {tb:.1f} ({tb-ta:+.1f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
