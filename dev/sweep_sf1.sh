#!/bin/bash
# Dev-only: the parity-at-scale regression gate (VERDICT round-4 item 9).
#
# Generates the 10x key-shifted sf1 fixture (if absent), dumps every
# SparkEntry query at sf1, and cell-exact-compares against the DuckDB
# oracles — the sweep SCALE.md describes, as one command:
#
#   dev/sweep_sf1.sh            # full sweep (~20-30 min)
#   dev/sweep_sf1.sh q_foo ...  # restrict to named queries
#
# Exit 0 iff Verify completed AND every oracled query is cell-exact at sf1.
set -e
cd "$(dirname "$0")/.."
SF1=${SPARK_GRAFT_SF1_DIR:-target/sf1}
OUT=${SPARK_GRAFT_SWEEP_OUT:-/tmp/sweep_sf1}
LOG=${SPARK_GRAFT_SWEEP_LOG:-/tmp/sweep_sf1_verify.log}

sbt -batch compile < /dev/null

# a complete fixture has a _SUCCESS marker for EVERY table — a generation
# run that died midway must be repaired, not silently reused
complete=1
for t in region nation customer supplier part orders lineitem events documents embeddings; do
  [ -f "$SF1/$t.parquet/_SUCCESS" ] || complete=0
done
if [ "$complete" -ne 1 ]; then
  echo "== generating sf1 fixture ($SF1) from /root/testdata/sf0.1 =="
  rm -rf "$SF1"
  dev/run.sh graft.ScaleGen /root/testdata/sf0.1 "$SF1" 10 2>/dev/null
fi

echo "== dumping queries at sf1 (log: $LOG) =="
rm -rf "$OUT"
# Verify's own exit status must gate the sweep — piping straight into grep
# would make a crashed dump look like 160 per-query oracle failures
if ! SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    dev/run.sh graft.Verify "$SF1" "$OUT" "$@" > "$LOG" 2>&1; then
  echo "== Verify CRASHED — last log lines: =="
  tail -20 "$LOG"
  exit 1
fi
grep "\[verify\]" "$LOG" || true   # per-query failure lines, if any

echo "== DuckDB compare =="
python3 dev/check.py "$SF1" "$OUT" "$@"
