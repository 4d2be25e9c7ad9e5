#!/usr/bin/env python
"""Compare two bench.py JSON outputs query-by-query.

Usage: python tools/compare_bench.py BASE.json NEW.json [ratio_flag]

Prints per-query seconds and NEW/BASE ratio, sorted by ratio descending,
plus aggregate wall over the common query set. ``ratio_flag`` (default 1.5)
marks queries whose ratio exceeds it — for same-sf runs that's a regression
screen; for cross-sf runs (e.g. sf0.1 → sf1) pass the data growth factor
to screen for superlinear scaling.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    with open(base_path) as f:
        base = json.load(f)["queries"]
    with open(new_path) as f:
        new = json.load(f)["queries"]
    common = sorted(set(base) & set(new))
    rows = []
    for q in common:
        b, n = base[q], new[q]
        rows.append((n / b if b > 0 else float("inf"), q, b, n))
    rows.sort(reverse=True)
    flagged = 0
    for r, q, b, n in rows:
        mark = " <-- over flag" if r > flag else ""
        if r > flag:
            flagged += 1
        print(f"{q:40s} {b:8.2f}s {n:8.2f}s  x{r:5.2f}{mark}")
    tb, tn = sum(base[q] for q in common), sum(new[q] for q in common)
    print(f"\n{len(common)} common queries: {tb:.1f}s -> {tn:.1f}s "
          f"(x{tn / tb:.2f}); {flagged} over the x{flag} flag")


if __name__ == "__main__":
    main()
