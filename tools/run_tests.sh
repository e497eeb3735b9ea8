#!/usr/bin/env bash
# Runs the full ScalaTest suite and records the outcome as TESTS_r<N>.json
# (suite/test counts, failures, exit code) so per-round test evidence is an
# artifact, not a 14-minute re-run for whoever audits the round.
# Both framework summary lines are recorded VERBATIM: sbt's own
# "Passed: Total N, Failed N, ..." (the line an auditor's re-run prints —
# it counts every test sbt executed) alongside scalatest's
# "Tests: succeeded N, ..." (which omits tests reported outside the last
# aggregated run block), so the two counts reconcile without archaeology
# (round-15 verdict: artifact said 531, a fresh run printed Total 545).
# Usage: tools/run_tests.sh <round-number>
set -uo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/run_tests.sh <round-number>}"
LOG=$(mktemp)
sbt -batch test 2>&1 | tee "$LOG"
EXIT=${PIPESTATUS[0]}
# scalatest summary: "Tests: succeeded 273, failed 0, canceled 0, ignored 0, pending 0"
SUMMARY=$(grep -E '^\[info\] Tests: ' "$LOG" | tail -1 | sed 's/^\[info\] //')
# sbt summary: "Passed: Total 545, Failed 0, Errors 0, Passed 545" on
# success, "[error] Failed: Total N, Failed N, ..." on failure
SBT_SUMMARY=$(grep -E '^\[(info|error)\] (Passed|Failed): Total ' "$LOG" | tail -1 | sed -E 's/^\[(info|error)\] //')
SUCC=$(echo "$SBT_SUMMARY" | sed -nE 's/.*Total ([0-9]+).*/\1/p')
FAIL=$(echo "$SBT_SUMMARY" | sed -nE 's/.*Failed ([0-9]+).*/\1/p')
SUITES=$(grep -cE '^\[info\] [A-Za-z0-9.]*Spec:$' "$LOG")
DATE=$(date -u +%Y-%m-%dT%H:%M:%SZ)
printf '{"round":%s,"utc":"%s","suites":%s,"succeeded":%s,"failed":%s,"exit_code":%s,"sbt_summary":"%s","scalatest_summary":"%s"}\n' \
  "$ROUND" "$DATE" "${SUITES:-0}" "${SUCC:-null}" "${FAIL:-null}" "$EXIT" \
  "$SBT_SUMMARY" "$SUMMARY" \
  | tee "TESTS_r$(printf '%02d' "$ROUND").json"
rm -f "$LOG"
exit "$EXIT"
