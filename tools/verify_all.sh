#!/usr/bin/env bash
# One-command standing verify recipe (README "Standing verify recipe"):
#   1. sbt test                      — full ScalaTest suite
#   2. graft.Verify                  — dump every query + oracle SQL at sf0.01
#   3. tools/typelint.py             — DuckDB DESCRIBE type lint over every oracle
#   4. tools/q69_cross_check.py      — multi-chunk oracle branch cross-check
# Exits non-zero on the FIRST failing step; each step's exit code is printed.
# Usage: tools/verify_all.sh [sfDir] [outDir]
set -u
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out}"
cd "$(dirname "$0")/.."

step() {
  local name="$1"; shift
  echo "==== [$name] $*"
  "$@"
  local rc=$?
  echo "==== [$name] exit $rc"
  if [ $rc -ne 0 ]; then
    echo "VERIFY_ALL: FAIL at step '$name' (exit $rc)" >&2
    exit $rc
  fi
}

step "sbt-test"   sbt -batch test
step "verify"     sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
step "typelint"   python3 tools/typelint.py "$OUT_DIR" "$SF_DIR"
step "q69-cross"  python3 tools/q69_cross_check.py "$OUT_DIR"
echo "VERIFY_ALL: PASS (suite + verify dump + typelint + q69 cross-check)"
