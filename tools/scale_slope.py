#!/usr/bin/env python3
"""Scale-slope report: compare two subset-bench JSON lines (same query
set, sf0.1 vs the 10x sf1 replica from tools/gen_sf1.py) and print the
per-query sec slope. With perfectly linear scaling a 10x data increase
costs <= 10x per query (usually much less at this size because the
fixed job floor amortizes); anything >> 10x names a superlinear operator.

Usage: python3 tools/scale_slope.py <sf0.1.json> <sf1.json>
Each file: the one-line JSON printed by graft.Bench ({"queries": {...}}).
"""
import json, sys

def load(p):
    for line in open(p):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    raise SystemExit(f"no bench JSON line in {p}")

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(a) & set(b), key=lambda q: -b[q])
    print(f"{'query':34s} {'sf0.1':>7s} {'sf1':>7s} {'slope':>6s}")
    rows = []
    for q in common:
        slope = b[q] / a[q] if a[q] > 0 else float("inf")
        rows.append((q, a[q], b[q], slope))
        print(f"{q:34s} {a[q]:7.2f} {b[q]:7.2f} {slope:5.1f}x")
    tot_a, tot_b = sum(a[q] for q in common), sum(b[q] for q in common)
    print(f"{'TOTAL':34s} {tot_a:7.2f} {tot_b:7.2f} {tot_b/tot_a:5.1f}x")
    worst = [r for r in rows if r[3] > 15.0]
    if worst:
        print("SUPERLINEAR (>15x on 10x data): " +
              ", ".join(f"{q}({s:.0f}x)" for q, _, _, s in worst))

if __name__ == "__main__":
    main()
