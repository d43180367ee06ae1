#!/usr/bin/env python3
"""Median/spread report over N canary bench runs (fresh-JVM each),
plus the box-vs-code attribution test for board comparisons.

Usage:
  canary_report.py /tmp/canary_run*.json
      Markdown table (query, median, min, max, spread%) sorted by median
      desc, totals, ingest docs/s medians, and the store-gate vs CPU-row
      family medians over whatever rows the runs contain.

  canary_report.py --board OLD.json NEW.json
      Compare two full-board bench lines (bench_out.json schema: a
      "queries" map of seconds). Computes per-family median RATIOS
      (new/old) for the store-gate family vs the CPU rows and prints the
      BENCH_NOTES attribution verdict as a computed result, not prose:
      store rows elevated while CPU rows sit at ~1.0x => the box pays
      more per small-commit I/O today (these gates are many-small-commit
      store builds, the most I/O-sensitive shape on the board); both
      elevated together => uniform box load; CPU rows elevated alone or
      individual non-family outliers => code suspects, bisect those.
"""
import json
import statistics
import sys

# The many-small-commit persisted-store gates BENCH_NOTES tracks as a
# family (each pays index build + several O(batch) DeltaLog commits +
# live-view reads inside the timed body). They move TOGETHER with box
# I/O latency and have twice been hand-bisected to identical bands on
# old-vs-new binaries (r15 close, r14 close) — this list is what makes
# that attribution automatic.
STORE_GATE_ROWS = {
    "x_geo_upsert", "x_geo_stats",
    "x_signature_stats",
    "x_phrase_incremental", "x_postings_stats",
    "x_dedup_incremental_build", "x_dedup_incremental_probe",
    "x_sim_ivf_upsert", "x_sim_ivf_stats", "x_sim_ivf_append",
    "x_sim_ivf_persisted",
    "x_bm25_incremental",
    "ingest_pipeline",  # sink-side merge + manifest commit + fencing
}

# Thresholds for the computed verdict. ELEVATED: beyond the documented
# same-code board noise (~10-15%); FLAT: inside it. Per-row code-suspect
# rule is the standing sweep rule: >25% AND >100 ms.
ELEVATED = 1.15
FLAT = 1.10


def family_medians(pairs):
    """pairs: {name: (old_s, new_s)} -> (store_med, cpu_med, ratios)."""
    ratios = {n: b / a for n, (a, b) in pairs.items() if a > 0 and b > 0}
    store = [r for n, r in ratios.items() if n in STORE_GATE_ROWS]
    cpu = [r for n, r in ratios.items() if n not in STORE_GATE_ROWS]
    med = lambda xs: statistics.median(xs) if xs else None
    return med(store), med(cpu), ratios


def board_compare(old_path, new_path):
    with open(old_path) as f:
        old = json.load(f)["queries"]
    with open(new_path) as f:
        new = json.load(f)["queries"]
    common = {n: (old[n], new[n]) for n in old.keys() & new.keys()}
    store_med, cpu_med, ratios = family_medians(common)

    # board-order context: Bench executes rows ALPHABETICALLY, so a row
    # inserted between two old rows changes its neighbors' warm-up
    # context (JIT profiles, codegen-cache locality) — twice the
    # recorded cause of spurious per-row movers (x_sim_ivf +28% in r14,
    # MP3-insert neighbors in r15). Flag comparable rows alphabetically
    # adjacent to an insertion so their movement is read as context
    # first, code second.
    added = sorted(new.keys() - old.keys())
    removed = sorted(old.keys() - new.keys())
    context_shifted = set()
    if added or removed:
        new_order = sorted(new.keys())
        old_order = sorted(old.keys())
        for a in added:
            i = new_order.index(a)
            context_shifted.update(new_order[max(0, i - 2):i + 3])
        for rname in removed:
            i = old_order.index(rname)
            context_shifted.update(old_order[max(0, i - 2):i + 3])
        context_shifted &= common.keys()
        print(f"board delta: +{len(added)} rows {added}, "
              f"-{len(removed)} rows {removed}")
        if context_shifted:
            print("context-shifted neighbors (alphabetical warm-up order "
                  f"changed; movement here is JIT context first): "
                  f"{sorted(context_shifted)}")
    n_store = sum(1 for n in ratios if n in STORE_GATE_ROWS)
    n_cpu = len(ratios) - n_store
    print(f"rows compared: {len(ratios)} "
          f"({n_store} store-gate, {n_cpu} cpu)")
    print(f"store-gate family median ratio (new/old): {store_med:.3f}"
          if store_med else "store-gate family: no comparable rows")
    print(f"cpu-row family median ratio (new/old):    {cpu_med:.3f}"
          if cpu_med else "cpu rows: no comparable rows")

    # the BENCH_NOTES test, computed
    if store_med is None or cpu_med is None:
        verdict = "INSUFFICIENT ROWS for the family test"
    elif store_med > ELEVATED and cpu_med < FLAT:
        verdict = ("BOX (I/O): store-gate rows elevated while CPU rows "
                   "sit at ~1.0x — the box pays more per small-commit "
                   "I/O; do not bisect code for the store rows")
    elif store_med > ELEVATED and cpu_med > ELEVATED:
        verdict = ("BOX (uniform load): both families elevated together "
                   "— compare cold totals; re-run on a quiet box")
    elif cpu_med > ELEVATED:
        verdict = ("SUSPECT CODE: CPU rows elevated " +
                   ("alone " if store_med <= ELEVATED else "") +
                   "— a real regression shows here first; bisect the "
                   "per-row outliers below")
    elif store_med > ELEVATED:
        # cpu_med in (FLAT, ELEVATED]: ambiguous — store rows clearly
        # elevated, CPU rows neither flat nor clearly elevated
        verdict = (f"AMBIGUOUS (box-leaning): store-gate median "
                   f"{store_med:.3f} elevated while CPU median "
                   f"{cpu_med:.3f} sits between the noise band and the "
                   "elevation bar — likely box I/O plus mild load; "
                   "re-run on a quiet box before bisecting")
    elif store_med > FLAT or cpu_med > FLAT:
        verdict = (f"MILD: medians store {store_med:.3f} / cpu "
                   f"{cpu_med:.3f} — above the noise band but under the "
                   "elevation bar; watch, do not bisect")
    else:
        verdict = "FLAT: both family medians inside the noise band"
    print(f"attribution: {verdict}")

    # per-row code suspects under the standing sweep rule, regardless of
    # the family verdict (a single genuine regression must not hide
    # behind a flat median)
    suspects = [(n, r, common[n][0], common[n][1])
                for n, r in sorted(ratios.items(), key=lambda kv: -kv[1])
                if r > 1.25 and (common[n][1] - common[n][0]) > 0.1]
    if suspects:
        print("rows over the sweep rule (>25% AND >100 ms) — "
              "re-measure fresh-JVM before bisecting:")
        for n, r, a, b in suspects:
            fam = "store-gate" if n in STORE_GATE_ROWS else "cpu"
            ctx = ", context-shifted" if n in context_shifted else ""
            print(f"  {n} [{fam}{ctx}]: {a:.3f} -> {b:.3f} s ({r:.2f}x)")
    else:
        print("no row crosses the sweep rule (>25% AND >100 ms)")


def canary_report(paths):
    runs = []
    fulls = []
    for path in paths:
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

    # family medians over the rows present (absolute seconds): gives the
    # round a recorded store-gate reading to ratio against next round
    store = [med for n, med, *_ in rows
             if med is not None and n in STORE_GATE_ROWS]
    cpu = [med for n, med, *_ in rows
           if med is not None and n not in STORE_GATE_ROWS]
    if store:
        print(f"store-gate family rows present: {len(store)}; "
              f"median {statistics.median(store):.3f} s")
    if cpu:
        print(f"cpu-row family rows present: {len(cpu)}; "
              f"median {statistics.median(cpu):.3f} s")

    # ingest throughput rows (r14 verdict: a 3.8x board-level ingest swing
    # must be caught in-round — the canary tracks docs/s medians too)
    for key in ("ingest_docs_per_sec", "ingest_delta_docs_per_sec"):
        vals = [d[key] for d in fulls if d.get(key, -1) > 0]
        if vals:
            med = statistics.median(vals)
            print(f"{key}: median {med:.0f} (min {min(vals):.0f}, "
                  f"max {max(vals):.0f}, spread "
                  f"{(max(vals) - min(vals)) / med * 100:.0f}%)")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--board":
        if len(sys.argv) != 4:
            sys.exit("usage: canary_report.py --board OLD.json NEW.json")
        board_compare(sys.argv[2], sys.argv[3])
    else:
        canary_report(sys.argv[1:])
