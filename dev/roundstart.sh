#!/bin/bash
# Round-start sanity: the driver REGENERATES /root/testdata between rounds,
# so physical schemas and value sets can shift with zero code changes.
# Run this before anything else each round:
#   1. dump every fixture table's physical parquet schema (diff by eye or
#      against FIXTURES.md),
#   2. sweep the double->DECIMAL knife-edge (PARITY.md §4: a new half-way
#      value can appear in any regeneration and only shows up as a
#      driver-gate hash mismatch months of local runs never see).
set -e
cd "$(dirname "$0")/.."
echo "== physical schemas =="
python3 - <<'EOF'
import pyarrow.parquet as pq, glob, os
for sf in sorted(glob.glob('/root/testdata/sf*')):
    for f in sorted(glob.glob(f'{sf}/*.parquet')):
        s = pq.read_schema(f) if os.path.isfile(f) else pq.read_schema(sorted(glob.glob(f'{f}/*.parquet'))[0])
        cols = ', '.join(f'{n}:{s.field(n).type}' for n in s.names)
        print(f'{os.path.basename(sf)}/{os.path.basename(f)}: {cols}')
EOF
echo
echo "== decimal-cast knife-edge sweep =="
python3 dev/check.py --castscan
