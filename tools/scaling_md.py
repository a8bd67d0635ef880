#!/usr/bin/env python3
"""Render SCALING.md's measurement table from graft.tools.ScaleBench JSON.

Usage: python3 tools/scaling_md.py <log-or-json> [<log-or-json> ...]
Each input contributes one ScaleBench JSON line (the last in the file);
cells are merged by per-(factor, query) MINIMUM across inputs — the same
min-across-repeats discipline as bench/rN.json, robust to one-off machine
contention. Prints the markdown table (seconds at each factor + growth
ratios vs x1); the narrative in SCALING.md is written by hand.
"""
import json
import sys

merged = {}
heap = None
for path in sys.argv[1:]:
    txt = open(path).read()
    line = [l for l in txt.splitlines() if '"factors"' in l][-1]
    d = json.loads(line[line.index('{'):])
    heap = d["max_heap_gb"]
    for f, qs in d["factors"].items():
        for q, v in qs.items():
            cur = merged.setdefault(f, {})
            cur[q] = min(cur[q], v) if q in cur else v

factors = sorted(merged, key=int)
base = factors[0]  # ratios are vs the SMALLEST MEASURED factor, labeled as such
queries = []
for f in factors:  # union across factors — a query measured only at later
    for q in merged[f]:  # factors must not silently vanish from the table
        if q not in queries:
            queries.append(q)
for f in factors:
    missing = [q for q in queries if q not in merged[f]]
    if missing:
        print(f"<!-- x{f}: no measurement for {', '.join(missing)} -->")
print("| query | " + " | ".join(f"x{f} (s)" for f in factors) +
      " | " + " | ".join(f"x{f}/x{base}" for f in factors[1:]) + " |")
print("|---|" + "---|" * (2 * len(factors) - 1))
for q in queries:
    t = [merged[f].get(q) for f in factors]
    cells = " | ".join("-" if v is None else f"{v:.2f}" for v in t)
    ratios = " | ".join(
        "-" if v is None or not t[0] else f"{v / t[0]:.2f}x" for v in t[1:])
    print(f"| {q} | {cells} | {ratios} |")
tot = [sum(v for v in merged[f].values() if v is not None) for f in factors]
full = all(len(merged[f]) == len(queries) for f in factors)
if full:
    print("| **total** | " + " | ".join(f"**{v:.2f}**" for v in tot) +
          " | " + " | ".join(f"**{v / tot[0]:.2f}x**" for v in tot[1:]) + " |")
print()
print(f"max driver heap: {heap} GiB")
