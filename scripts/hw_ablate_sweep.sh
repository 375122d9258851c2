#!/bin/bash
# DP cost-model ablation sweep on hardware (engine bench throughput for
# each NPORE_DP_ABLATE variant). Variants other than 'notier' produce
# WRONG alignments -- throughput measurement only. Run alone (one device
# client), after hw_check passes.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_ablate}
mkdir -p "$OUT"
for A in none notier nhi1 nolenshr nomatch noovf noadv; do
  echo "== NPORE_DP_ABLATE=$A =="
  env $( [ "$A" != none ] && echo NPORE_DP_ABLATE=$A ) \
      timeout 3000 python scripts/bench_engine.py \
      > "$OUT/ablate_$A.log" 2>&1 || { tail -3 "$OUT/ablate_$A.log"; continue; }
  tail -1 "$OUT/ablate_$A.log"
done
