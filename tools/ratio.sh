#!/bin/bash
# Same-host, same-session spark-vs-duckdb ratio artifact (RATIO_rN.json),
# the r14 verdict's item 1b: the graded bench carries its own denominator
# as machine-readable JSON instead of BENCHNOTES prose. Runs the full
# graft.Bench sweep at the driver's config (cpus=32), then times every
# DuckDB oracle in the same invocation of bench_compare.py — one host,
# one session, both columns. Also regenerates BENCHNOTES.md from the same
# sweep so the prose table and the JSON artifact can never disagree.
#
# Usage: tools/ratio.sh <round-number> [sfDir]
# PROTOCOL: run on an otherwise-quiet box (no concurrent sbt builds —
# they inflate walls 1.5-4x; see graft memory / BENCHNOTES provenance).
set -euo pipefail
N=${1:?usage: tools/ratio.sh <round-number> [sfDir]}
SF=${2:-/root/testdata/sf0.1}
cd "$(dirname "$0")/.."

ORACLE=target/verify_out/oracle_sql.json
if [ ! -f "$ORACLE" ]; then
  # a one-query Verify still dumps the full oracle_sql.json
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_out a1_count_rows" >/dev/null
fi

PREV_FULL=$(git show HEAD:BENCHFULL.json > target/benchfull_prev.json 2>/dev/null \
  && echo target/benchfull_prev.json || true)

SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
  | python3 tools/bench_compare.py "$SF" "$ORACLE" \
      --out=BENCHNOTES.md --ratio-out="RATIO_r${N}.json"
echo "wrote RATIO_r${N}.json + BENCHNOTES.md (spark line also in BENCHFULL.json)"

# host-invariant regression gate (r14 verdict item 3): diff the plan
# metrics against the previously committed artifact; exit 2 = the old
# artifact predates plan maps (pre-r15), informational only
if [ -n "${PREV_FULL}" ]; then
  python3 tools/bench_drift.py "$PREV_FULL" BENCHFULL.json || true
fi
