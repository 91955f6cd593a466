#!/usr/bin/env bash
# The full local correctness gate — run before any commit that touches
# queries, oracles, or operators. Mirrors what the driver grades plus
# the two surfaces the driver can't see (second SF, degenerate data):
# 274 of the 324 registry queries are NOT in the driver's fixed 50-key
# snapshot, so this script is the only thing standing between an edit
# to one of them and a silently-shipped regression.
#
# Usage: tools/precommit_gate.sh [quick]
#   quick — sf0.01 registry + pytest only (inner-loop edits);
#   default runs all three SFs + the global-window audit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== oracle gate @ sf0.01 =="
python tools/check_oracle.py

echo "== pytest =="
python -m pytest tests/ -q

if [[ "${1:-full}" != "quick" ]]; then
  echo "== oracle gate @ sf0.001 (different rounding-boundary dice) =="
  python tools/check_oracle.py --sf /root/testdata/sf0.001

  echo "== degenerate sweep (1-row tables, ties, zero vectors) =="
  python tools/make_degenerate.py
  python tools/check_oracle.py --sf /tmp/spark_graft_degenerate

  echo "== global-window audit =="
  python tools/audit_global_windows.py
fi

echo "== gate PASSED =="
