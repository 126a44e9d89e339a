#!/usr/bin/env python3
"""Compare two Bench detail files (same protocol) and print the per-query
scale ratio table for SCALE.md.

Usage: python3 tools/scale_ratio.py <detail_small.jsonl> <detail_large.jsonl>
       [--min-large SECONDS]

Prints every query with its small/large best time and the ratio, sorted
by ratio descending, plus a summary (totals, median ratio, >K× counts).
"""
import json
import sys


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            out[r["q"]] = r["best"]
    return out


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    min_large = 0.0
    if "--min-large" in sys.argv:
        min_large = float(sys.argv[sys.argv.index("--min-large") + 1])
    a, b = load(a_path), load(b_path)
    rows = []
    for q in sorted(a):
        if q not in b or b[q] < min_large:
            continue
        rows.append((q, a[q], b[q], b[q] / max(a[q], 1e-9)))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':44s} {'small_s':>8s} {'large_s':>8s} {'ratio':>7s}")
    for q, sa, sb, r in rows:
        print(f"{q:44s} {sa:8.2f} {sb:8.2f} {r:7.1f}")
    ta = sum(a[q] for q, *_ in [(r[0],) for r in rows])
    tb = sum(b[q] for q, *_ in [(r[0],) for r in rows])
    med = sorted(r[3] for r in rows)[len(rows) // 2] if rows else 0
    print(f"\nqueries={len(rows)} total_small={ta:.1f}s total_large={tb:.1f}s "
          f"overall_ratio={tb / max(ta, 1e-9):.1f} median_ratio={med:.2f}")
    for k in (2, 5, 10):
        n = sum(1 for r in rows if r[3] > k)
        print(f">{k}x: {n}")


if __name__ == "__main__":
    main()
