#!/bin/bash
# DP row-unroll sweep on hardware: engine throughput for
# NPORE_DP_UNROLL in {1, 2, 6}. Each value compiles fresh kernels
# (1-3 min per shape on the remote-compile service) — run AFTER
# hw_check.sh passes, never concurrently with other device clients.
# Rationale: the per-row cost is carry/vector-op bound; unrolling by 6
# (the lcm of every carried history period) turns the tuple rotations
# into SSA renames, which may stop Mosaic copying ~40 carried (32,128)
# tiles through loop slots every row.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_unroll}
mkdir -p "$OUT"
for U in 1 2 6; do
  echo "== NPORE_DP_UNROLL=$U =="
  NPORE_DP_UNROLL=$U timeout 3000 python scripts/bench_engine.py \
      > "$OUT/unroll_$U.log" 2>&1 || { tail -3 "$OUT/unroll_$U.log"; continue; }
  tail -2 "$OUT/unroll_$U.log"
done
echo "validate the winner with scripts/fuzz_parity.py 60 under the same env"
