#!/bin/bash
# Run the honest perf labs serially on the real TPU (the axon tunnel admits
# ONE client at a time — never parallelize these; see CLAUDE.md gotchas).
# Usage: bash scripts/run_perf_suite.sh [outdir]
set -u
OUT=${1:-/tmp/perf_suite}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
for lab in lab19_honest lab13_spec lab20_kenan lab16_fakebob lab17_stage2 lab14_stage1; do
  echo "=== perf/${lab}.py ==="
  timeout 7000 python "perf/${lab}.py" 2>&1 | tee "$OUT/${lab}.log" | grep -v xla_bridge
done
echo "logs in $OUT"
