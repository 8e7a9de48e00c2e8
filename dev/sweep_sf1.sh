#!/bin/bash
# Dev-only: the parity-at-scale regression gate (VERDICT round-4 item 9).
#
# Generates the 10x key-shifted sf1 fixture (if absent), dumps every
# SparkEntry query at sf1, and cell-exact-compares against the DuckDB
# oracles — the sweep SCALE.md describes, as one command:
#
#   dev/sweep_sf1.sh            # full sweep (~10-15 min)
#   dev/sweep_sf1.sh q_foo ...  # restrict to named queries
#
# Exit 0 iff every oracled query is cell-exact at sf1.
set -e
cd "$(dirname "$0")/.."
SF1=${SPARK_GRAFT_SF1_DIR:-target/sf1}
OUT=${SPARK_GRAFT_SWEEP_OUT:-/tmp/sweep_sf1}

sbt -batch compile < /dev/null

if [ ! -f "$SF1/documents.parquet/_SUCCESS" ]; then
  echo "== generating sf1 fixture ($SF1) from /root/testdata/sf0.1 =="
  dev/run.sh graft.ScaleGen /root/testdata/sf0.1 "$SF1" 10 2>/dev/null
fi

echo "== dumping queries at sf1 =="
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  dev/run.sh graft.Verify "$SF1" "$OUT" "$@" 2>&1 | grep "\[verify\]" || true

echo "== DuckDB compare =="
python3 dev/check.py "$SF1" "$OUT" "$@"
