"""Tolerance-banded golden comparison for metrics tables.

``diff`` against the golden made CI rebase-fragile: at 3 000 reads one
boundary read is 0.03%, so a legitimately tie-breaking change costs a
golden rebase.  This checker compares the markdown tables row by row
and fails only when a numeric field drifts more than ``--tol``
(default 0.005 = half a percentage point) — still far tighter than any
real regression, but immune to single-read flutter.

Usage: python tools/golden_diff.py GOLDEN [--tol T] < actual_table
Exits nonzero (printing the offending rows) on mismatch.
"""

import argparse
import sys


def parse_table(lines):
    rows = {}
    for ln in lines:
        ln = ln.strip()
        if not ln.startswith("|") or ln.startswith("|-") or ln.startswith("|metric"):
            continue
        parts = [p.strip() for p in ln.strip("|").split("|")]
        if len(parts) < 2:
            continue
        try:
            rows[parts[0]] = float(parts[1])
        except ValueError:
            rows[parts[0]] = parts[1]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("golden")
    ap.add_argument("--tol", type=float, default=0.005)
    args = ap.parse_args()

    with open(args.golden) as f:
        want = parse_table(f)
    got = parse_table(sys.stdin)

    bad = []
    for key, w in want.items():
        if key not in got:
            bad.append(f"missing row: {key!r}")
            continue
        g = got[key]
        if isinstance(w, float) and isinstance(g, float):
            if abs(g - w) > args.tol:
                bad.append(f"{key!r}: {g} vs golden {w} (tol {args.tol})")
        elif g != w:
            bad.append(f"{key!r}: {g!r} vs golden {w!r}")
    for key in got:
        if key not in want:
            bad.append(f"unexpected row: {key!r}")
    if bad:
        print("golden mismatch:\n  " + "\n  ".join(bad), file=sys.stderr)
        return 1
    print(f"golden ok ({len(want)} rows within tol {args.tol})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
