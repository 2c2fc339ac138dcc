#!/usr/bin/env python3
"""Dev-only: render the round-14 served-position adjudication table from a
bench record pair (default order vs SPARK_GRAFT_SERVED_POSITION=first).

For every served-family query, prints serve_sec and the pre-serve probe
readings side by side, plus the delta — the q156 instrument: a serve
that is fast when run first and slow when run last, with the probe
readings moving in step, is sweep churn; one that stays slow on a clean
probe is the query's own cost.

Usage: python3 tools/served_pair_report.py last.json first.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


last, first = load(sys.argv[1]), load(sys.argv[2])
print(f"{'query':<36} {'last_s':>7} {'first_s':>8} {'delta':>7}  "
      f"{'last probe (mb/heap/micro)':>28} {'first probe':>24}")
for q in sorted(set(last["served"]) | set(first["served"])):
    a, b = last["served"].get(q, {}), first["served"].get(q, {})
    sa, sb = a.get("serve_sec"), b.get("serve_sec")
    pa = (f"{a.get('pre_cached_mb', -1):.0f}/{a.get('pre_heap_mb', -1):.0f}"
          f"/{a.get('pre_micro_sec', -1):.3f}")
    pb = (f"{b.get('pre_cached_mb', -1):.0f}/{b.get('pre_heap_mb', -1):.0f}"
          f"/{b.get('pre_micro_sec', -1):.3f}")
    d = (sa - sb) if (sa is not None and sb is not None) else float("nan")
    print(f"{q:<36} {sa:>7.2f} {sb:>8.2f} {d:>7.2f}  {pa:>28} {pb:>24}")
for tag, rec in (("last", last), ("first", first)):
    print(f"[{tag}] total={rec['value']:.1f} control={rec['control_ratio']} "
          f"iter={rec['iter_control_ratio']} graph={rec['graph_control_ratio']} "
          f"n_failed={rec['n_failed']} pos={rec.get('served_position')}")
