#!/usr/bin/env python3
"""Compare an sfN bench sweep against the committed sf0.1 medians.

Medians come from the freshest committed per-query evidence: the r06
scope-115 runs (n=3) where present, falling back to the PERF.md r04
medians table via bench/r04_scope108_run*.json (n=5). Prints per-query
ratios sorted descending so scaling cliffs surface first.

Usage: python3 tools/compare_sfN.py bench/r07_sf10_run1.json [scale]
       (scale = the data multiple vs sf0.1; default 100)
"""
import glob
import json
import statistics
import sys


def med_from(runs_glob):
    per = {}
    for p in sorted(glob.glob(runs_glob)):
        qs = json.load(open(p))["queries"]
        for k, v in qs.items():
            if v > 0:
                per.setdefault(k, []).append(v)
    return {k: statistics.median(v) for k, v in per.items()}


def main():
    target = json.load(open(sys.argv[1]))
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    base = med_from("bench/r04_scope108_run*.json")
    base.update(med_from("bench/r06_scope115_run*.json"))
    base.update(med_from("bench/r07_scope119_run*.json"))
    # r08 driver-like runs (n=3 in-artifact medians) fill queries the
    # older scope runs don't know — fill-only, because that boot ran
    # ~1.6x faster than the committed-median era and would skew ratios
    # for queries that already have a consistent baseline
    for k, v in med_from("bench/r08_sf01_driverlike_run*.json").items():
        base.setdefault(k, v)
    rows = []
    for q, t in sorted(target["queries"].items()):
        if t < 0:
            print(f"FAILED {q}: {t}")
            continue
        b = base.get(q)
        rows.append((t / b if b else None, q, t, b))
    rows.sort(key=lambda r: -(r[0] or 0))
    print(f"{'query':40s} {'sfN_s':>9s} {'sf0.1_s':>8s} {'ratio':>7s}")
    for ratio, q, t, b in rows:
        r = f"{ratio:7.1f}" if ratio else "    new"
        bb = f"{b:8.2f}" if b else "       -"
        print(f"{q:40s} {t:9.2f} {bb} {r}")
    ok = [r[0] for r in rows if r[0]]
    med = f"{statistics.median(ok):.1f}" if ok else "n/a"
    print(f"\ntotal={target['value']:.1f}s n={len(rows)} "
          f"median_ratio={med} "
          f"(scale={scale:g}x; per-row-map queries amortize fixed costs "
          f"so ratios well under {scale:g} are expected)")


if __name__ == "__main__":
    main()
