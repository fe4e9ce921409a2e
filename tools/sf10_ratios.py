#!/usr/bin/env python3
"""Scale-proof ratio report: per-query sf10/sf0.1 timing ratios at 100x
data. A query scaling worse than ~15x at 100x data (i.e. markedly
superlinear) is a scale-killer candidate; sub-linear ratios mean the
fixed per-query overhead still dominates at sf10.

Usage: sf10_ratios.py <BENCH_sf10.json> <baseline BENCH_*.json> [limit]
The baseline should be the committed sf0.1 bench (min-of-3 per query).
Writes a JSON summary to stdout.
"""
import json
import sys


def main(sf10_path, base_path, limit=15.0):
    sf10 = json.load(open(sf10_path))["queries"]
    base = json.load(open(base_path))["queries"]
    rows = []
    for q, t10 in sorted(sf10.items()):
        t01 = base.get(q)
        if t01 is None or t01 <= 0 or t10 < 0:
            rows.append({"query": q, "sf10_sec": t10, "sf01_sec": t01, "ratio": None})
            continue
        rows.append({"query": q, "sf10_sec": round(t10, 3), "sf01_sec": round(t01, 3),
                     "ratio": round(t10 / t01, 2)})
    ratios = [r for r in rows if r["ratio"] is not None]
    ratios.sort(key=lambda r: -r["ratio"])
    over = [r for r in ratios if r["ratio"] > limit]
    out = {
        "n_queries": len(rows),
        "limit_ratio_at_100x": limit,
        "n_over_limit": len(over),
        "over_limit": over,
        "worst10": ratios[:10],
        "total_sf10_sec": round(sum(r["sf10_sec"] for r in rows if r["sf10_sec"] and r["sf10_sec"] > 0), 2),
        "all": ratios,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 15.0)
