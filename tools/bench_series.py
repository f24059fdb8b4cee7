#!/usr/bin/env python3
"""Summarize BENCH_HISTORY.jsonl (one epoch-stamped summary line per
graft.Bench run) as a table: wall total, pass count, GC, and the
load-average evidence — the same-tree contention series at a glance.

Usage: python3 tools/bench_series.py [BENCH_HISTORY.jsonl]
Driver-side tooling only.
"""
import json
import sys
import time

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_HISTORY.jsonl"
rows = [json.loads(l) for l in open(path) if l.strip()]
print(f"{'when':16s} {'total':>7s} {'n':>4s} {'passes':>6s} {'gc_s':>5s} "
      f"{'load@start':>16s} {'end':>5s} {'gated':>5s} {'fail':>4s}")
for r in rows:
    when = time.strftime("%m-%d %H:%M", time.localtime(r["ts"]))
    load = "/".join(f"{x:.1f}" for x in r.get("load", []))
    print(f"{when:16s} {r['value']:7.2f} {r.get('n_queries', 0):4d} "
          f"{r.get('passes', 0):6d} {r.get('gc_ms', 0)/1000:5.1f} "
          f"{load:>16s} {r.get('load_end', -1):5.1f} "
          f"{r.get('gated', 0):5d} {r.get('n_failed', 0):4d}")
# subset runs (SPARK_GRAFT_ONLY) share the file; compare only
# full-registry runs AT THE SAME SF when naming the best (the history
# mixes /tmp sf1 subset runs with sf0.1 full runs — same n_queries at a
# different sf is a different workload, not a peer)
if not rows:
    print("\n(no runs in history)")
else:
    peak_n = max(x.get("n_queries", 0) for x in rows)
    peak_sf = next(r.get("sf") for r in rows
                   if r.get("n_queries", 0) == peak_n)
    full = [r for r in rows
            if r.get("n_queries") == peak_n and r.get("sf") == peak_sf]
    best = min(full, key=lambda r: r["value"])
    print(f"\nbest full run ({peak_sf}): {best['value']} s / "
          f"{best['n_queries']} queries at "
          f"{time.strftime('%m-%d %H:%M', time.localtime(best['ts']))} "
          f"(gc {best.get('gc_ms', 0)/1000:.1f} s, passes {best.get('passes')})")
