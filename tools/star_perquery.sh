#!/usr/bin/env bash
# Per-query-JVM star sweep: one BenchStar invocation per query so no
# contender sits in another's sweep through sustained heap pressure (the
# SF25_QUERIES lesson applied to the star tiers — the big-tier protocol the
# CROSSOVER sf50 row always used). Merges the per-query JSONs into the
# tier's full artifact target/bench_star_<label>.json.
#
# Usage: tools/star_perquery.sh <tierDir> <label>
# MUST run on an otherwise-quiet box: concurrent builds were measured to
# inflate walls 1.5-4x (round-12 lesson, twice).
set -euo pipefail
cd "$(dirname "$0")/.."
dir=$1; label=$2
rm -f "target/star_pq_${label}"_*.json
i=0
for q in q2_shipping_priority q3_revenue_by_nation q2_plain_legacy \
         q3_plain_legacy q2_bucketed q3_bucketed \
         a13_exact_percentiles q1_pricing_summary; do
  # 2>&1: with stderr detached sbt's stdout intermittently arrives empty
  # (observed twice on q3@sf25); keep both streams and filter. Retry once
  # on a missing line rather than dying mid-tier.
  for attempt in 1 2; do
    sbt -batch "runMain graft.tools.BenchStar $dir $label $q" 2>&1 \
      | grep star_total | sed 's/^\[info\] //' \
      > "target/star_pq_${label}_$i.json" || true
    [ -s "target/star_pq_${label}_$i.json" ] && break
    echo "retrying $q (empty output, attempt $attempt)"
  done
  [ -s "target/star_pq_${label}_$i.json" ] || { echo "FAILED $q"; exit 1; }
  echo "done $q: $(head -c 200 "target/star_pq_${label}_$i.json")"
  i=$((i+1))
done
python3 tools/merge_bench.py "target/bench_star_${label}.json" \
  "target/star_pq_${label}"_*.json
echo "merged -> target/bench_star_${label}.json"
