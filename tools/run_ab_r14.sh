#!/bin/bash
# r14 VERDICT #1 A/B: HEAD vs the r13 baseline commit 7b2cc30 for the two
# touched-and-regressed queries (spatial_contacts_grid, shard_concat_digest),
# interleaved process-pairs, 3 runs each (ab_table drops run 0), >=5 pairs.
# Usage: bash tools/run_ab_r14.sh OUT_JSONL [PAIRS]
set -e
OUT=${1:?out jsonl}
PAIRS=${2:-5}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
QUERIES="spatial_contacts_grid shard_concat_digest"
: > "$OUT"
for i in $(seq 1 "$PAIRS"); do
  # alternate arm order every pair so slow-host windows hit both arms
  if [ $((i % 2)) -eq 1 ]; then ARMS="/root/repo /tmp/base_7b2cc30"; else ARMS="/tmp/base_7b2cc30 /root/repo"; fi
  for REPO in $ARMS; do
    python tools/ab_bench.py "$REPO" "$SF" 3 $QUERIES >> "$OUT" 2>/dev/null
  done
  echo "pair $i done" >&2
done
python tools/ab_table.py "$OUT" HEAD base_7b2cc30
