#!/usr/bin/env python3
"""Fold isolation-retry minima into a bench candidate (dev/bench.sh).

Usage: bench_merge.py CANDIDATE.json ISOLATION.json OUT_FULL.json OUT_SUMMARY.json

For every query present in both maps, keep the MIN of the candidate's
min-of-3 and the isolation run's min-of-5 — the same estimator over more
passes. Patched queries are recorded under `isolation_reruns` so the map
stays auditable; `value` (the total) and the summary's top-5 are
recomputed from the patched per-query map.
"""
import json
import sys


def main():
    cand_path, iso_path, out_full, out_summary = sys.argv[1:5]
    cand = json.load(open(cand_path))
    iso = json.load(open(iso_path))
    reruns = dict(cand.get("isolation_reruns", {}))
    for q, t in iso.get("queries", {}).items():
        if q in cand["queries"] and t < cand["queries"][q]:
            cand["queries"][q] = round(t, 3)
            reruns[q] = round(t, 3)
    if reruns:
        cand["isolation_reruns"] = reruns
    total = sum(cand["queries"].values()) + sum(cand.get("failed", {}).values())
    cand["value"] = round(total, 3)
    json.dump(cand, open(out_full, "w"))
    top5 = dict(sorted(cand["queries"].items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": "total", "value": cand["value"], "unit": "sec",
        "queries": {k: round(v, 3) for k, v in top5.items()},
        "sf": cand.get("sf"), "n_queries": cand.get("n_queries"),
        "n_errors": cand.get("n_errors"),
        "speed_controls": cand.get("speed_controls", {}),
        "full": out_full,
    }
    json.dump(summary, open(out_summary, "w"))
    print(f"== merged {len(iso.get('queries', {}))} isolation minima "
          f"({len(reruns)} patched); total now {cand['value']}s ==")


if __name__ == "__main__":
    main()
