#!/usr/bin/env python3
"""Refresh tools/bench_baseline.json from a CLEAN bench run.

Usage: python3 tools/refresh_baseline.py <round_n> [bench_detail.json]

Reads target/bench_detail.json (written by graft.Bench) and emits the
canonical baseline shape Bench.readBaseline consumes:
  {"n": N, "queries": {q: best_sec}, "sf2": {q: sf2_best_sec}}

Refuses to refresh from a contaminated run: if any query's measured
spread exceeds 1 s AND it has no isolated re-run (iso_runs) tightening
it below 1 s, the run is judged dirty — rerun the bench in a quiet
window instead of baking interference slack into every baseline.
"""
import json
import sys

def main():
    if len(sys.argv) < 2:
        sys.exit("usage: refresh_baseline.py <round_n> [bench_detail.json]")
    n = int(sys.argv[1])
    detail_path = sys.argv[2] if len(sys.argv) > 2 else "target/bench_detail.json"
    with open(detail_path) as f:
        detail = json.load(f)
    queries = detail["queries"]
    dirty = []
    for q, s in queries.items():
        spread = s.get("spread", 0)
        iso = s.get("iso_runs")
        iso_spread = (max(iso) - min(iso)) if iso else None
        eff = iso_spread if iso_spread is not None else spread
        if eff > 1.0:
            dirty.append((q, spread, iso_spread))
    if dirty:
        for q, sp, isp in dirty:
            print(f"DIRTY {q}: spread={sp:.2f}s iso_spread={isp}", file=sys.stderr)
        sys.exit(f"refusing to refresh baseline from a contaminated run "
                 f"({len(dirty)} queries with effective spread > 1s)")
    out = {
        "n": n,
        "sf": detail.get("sf"),
        # Self-describing: the round-11 verdict compared main-SF times
        # against the sf2 map and reported phantom multi-x drifts
        # (BASELINE_NOTES round 12). readBaseline ignores this key.
        "comment": "queries = per-query BEST at the main SF (sf); "
                   "sf2 = per-query best at sf0.01 (dual-scale pass) — "
                   "NOT comparable to main-SF times",
        "queries": {q: s["best"] for q, s in queries.items() if s["best"] >= 0},
        "sf2": {q: s["sf2_best"] for q, s in queries.items()
                if s.get("sf2_best", -1) >= 0},
    }
    with open("tools/bench_baseline.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"baseline refreshed: n={n}, {len(out['queries'])} queries, "
          f"{len(out['sf2'])} sf2 entries")

if __name__ == "__main__":
    main()
