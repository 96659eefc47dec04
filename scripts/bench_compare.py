"""Compare two bench_regression.py JSON-lines files; flag regressions.

Usage: python scripts/bench_compare.py baseline.json new.json [--threshold 0.2]

Exit code 1 if any family regressed by more than the threshold (default
20% slower — wide enough to absorb tunnel RTT noise, tight enough to catch
a real kernel regression).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path):
    rows = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if "family" in row:
                rows[(row["family"], row["mode"])] = row["ms"]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()

    base = load(args.baseline)
    new = load(args.new)
    regressions = []
    width = max((len(f"{f}/{m}") for f, m in base), default=10)
    print(f"{'family/mode':<{width}}  {'base ms':>10}  {'new ms':>10}  {'ratio':>7}")
    for key in sorted(base):
        f, m = key
        b = base[key]
        if key not in new:
            print(f"{f + '/' + m:<{width}}  {b:>10.3f}  {'MISSING':>10}")
            regressions.append((key, None))
            continue
        n = new[key]
        ratio = n / b if b else float("inf")
        flag = " <-- REGRESSION" if ratio > 1 + args.threshold else ""
        print(f"{f + '/' + m:<{width}}  {b:>10.3f}  {n:>10.3f}  {ratio:>7.3f}{flag}")
        if ratio > 1 + args.threshold:
            regressions.append((key, ratio))
    for key in sorted(set(new) - set(base)):
        print(f"{key[0] + '/' + key[1]:<{width}}  {'NEW':>10}  {new[key]:>10.3f}")
    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond {args.threshold:.0%}")
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
