#!/usr/bin/env python3
"""Median/spread report over N canary bench runs (fresh-JVM each).

Usage: canary_report.py /tmp/canary_run*.json
Prints a markdown table (query, median, min, max, spread%) sorted by
median desc, plus totals. Spread = (max - min) / median.
"""
import json
import statistics
import sys

runs = []
fulls = []
for path in sys.argv[1:]:
    with open(path) as f:
        d = json.load(f)
        fulls.append(d)
        runs.append(d["queries"])
if not runs:
    sys.exit("no run files given")

names = sorted(set().union(*[set(r) for r in runs]))
rows = []
for n in names:
    vals = [r[n] for r in runs if n in r and r[n] >= 0]
    if not vals:
        rows.append((n, None, None, None, None))
        continue
    med = statistics.median(vals)
    spread = (max(vals) - min(vals)) / med if med > 0 else 0.0
    rows.append((n, med, min(vals), max(vals), spread))

rows.sort(key=lambda r: -(r[1] or 0))
print("| query | median s | min | max | spread |")
print("|---|---|---|---|---|")
for n, med, lo, hi, sp in rows:
    if med is None:
        print(f"| {n} | FAILED | - | - | - |")
    else:
        print(f"| {n} | {med:.3f} | {lo:.3f} | {hi:.3f} | {sp*100:.0f}% |")

tot = [sum(v for v in r.values() if v >= 0) for r in runs]
med_t = statistics.median(tot)
print(f"\ntotals per run: {['%.1f' % t for t in tot]} s; "
      f"median {med_t:.1f} s; spread "
      f"{(max(tot) - min(tot)) / med_t * 100:.1f}%")
wide = [n for n, med, lo, hi, sp in rows if sp is not None and sp > 0.5]
if wide:
    print(f"rows with >50% spread (noise, not regression signal): {wide}")

# ingest throughput rows (r14 verdict: a 3.8x board-level ingest swing
# must be caught in-round — the canary now tracks docs/s medians too)
for key in ("ingest_docs_per_sec", "ingest_delta_docs_per_sec"):
    vals = [d[key] for d in fulls if d.get(key, -1) > 0]
    if vals:
        med = statistics.median(vals)
        print(f"{key}: median {med:.0f} (min {min(vals):.0f}, "
              f"max {max(vals):.0f}, spread "
              f"{(max(vals) - min(vals)) / med * 100:.0f}%)")
