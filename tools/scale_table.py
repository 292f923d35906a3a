#!/usr/bin/env python3
"""Two-decade scale table (round-13 verdict #2): join same-session Bench
JSON lines at sf0.1 (1x), sf1 (10x) and sf10 (100x) into per-query
ratio columns, sorted by the 100x ratio so super-linear rows surface.

Usage: tools/scale_table.py bench_sf01.json bench_sf1.json bench_sf10.json
"""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                return d["queries"], d.get("errors", {})
    raise SystemExit(f"no JSON line in {p}")


q1, e1 = load(sys.argv[1])
q10, e10 = load(sys.argv[2])
q100, e100 = load(sys.argv[3])

rows = []
for name in sorted(q1):
    a, b, c = q1.get(name), q10.get(name), q100.get(name)
    if not a or a <= 0:
        continue
    r10 = b / a if b and b > 0 else None
    r100 = c / a if c and c > 0 else None
    rows.append((name, a, b, c, r10, r100))

rows.sort(key=lambda r: -(r[5] or r[4] or 0))
print(f"{'query':40s} {'sf0.1':>8s} {'sf1':>8s} {'sf10':>9s} {'x10':>6s} {'x100':>7s}")
for name, a, b, c, r10, r100 in rows:
    print(f"{name:40s} {a:8.2f} {(b or -1):8.2f} {(c or -1):9.2f} "
          f"{(r10 or -1):6.1f} {(r100 or -1):7.1f}")

t1 = sum(r[1] for r in rows)
t10 = sum(r[2] for r in rows if r[2] and r[2] > 0)
t100 = sum(r[3] for r in rows if r[3] and r[3] > 0)
print(f"\ntotals: sf0.1 {t1:.1f}s  sf1 {t10:.1f}s ({t10/t1:.1f}x)  "
      f"sf10 {t100:.1f}s ({t100/t1:.1f}x)")
sup10 = [r[0] for r in rows if r[4] and r[4] > 10]
sup100 = [r[0] for r in rows if r[5] and r[5] > 100]
print(f"super-linear at 10x (> 10.0): {sup10 or 'none'}")
print(f"super-linear at 100x (> 100.0): {sup100 or 'none'}")
for tag, errs in (("sf0.1", e1), ("sf1", e10), ("sf10", e100)):
    if errs:
        print(f"ERRORS {tag}: {errs}")
