#!/bin/bash
# Canary sub-board: ~50 representative, non-gate-cost queries run in
# FRESH JVMs N times (default 3); medians are the regression baseline.
# The full 339-row board's same-code run-to-run spread (184-204 s in
# round 10) swamps per-row comparison; the canary's per-query medians
# keep a <10% spread, so a real regression is visible above the noise.
#
# Usage: scripts/canary.sh [n_runs] [sf_dir]
set -e
cd "$(dirname "$0")/.."
RUNS=${1:-3}
SF=${2:-/root/testdata/sf0.1}
LIST=$(tr '\n' ',' < scripts/canary_queries.txt | sed 's/,$//')
for i in $(seq 1 "$RUNS"); do
  echo "[canary] run $i/$RUNS" >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_OUT=/tmp/canary_run$i.json \
    sbt -batch "runMain graft.Bench $LIST" > /dev/null 2>&1
done
python3 scripts/canary_report.py /tmp/canary_run*.json
