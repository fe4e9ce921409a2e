#!/bin/bash
# Per-round correctness gate, run before committing a round's evidence.
# Fails loudly (set -e) so no check can silently skip:
#   1. graft.Verify dumps every registry gate at sf0.01
#   2. check_correctness.py compares each against its DuckDB oracle
#   3. oracle_parity.py re-proves the PPJoin-blocked near-dup oracle
#      byte-equal to the naive all-pairs oracle at sf0.001/0.01/0.1
#      (the sf0.1 row guards the scale-sensitive prefix/length/position
#      filters — VERDICT r17 #3)
# Usage: tools/round_checks.sh [outDir]   (default /tmp/verify_round)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/verify_round}"
sbt -batch compile
tools/run_main.sh graft.Verify /root/testdata/sf0.01 "$OUT"
python3 tools/check_correctness.py /root/testdata/sf0.01 "$OUT"
python3 tools/oracle_parity.py "$OUT" \
  /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1 \
  | tee ORACLE_PARITY_LINE.json
echo "round_checks: ALL GREEN"
