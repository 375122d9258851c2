#!/bin/bash
# One-shot hardware validation + measurement sweep (run after any engine
# change, or after the axon backend recovers). Sequential, generous
# timeouts, never concurrent device clients — see CLAUDE.md wedge note.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_check}
mkdir -p "$OUT"

echo "== 1/5 realign CLI golden-SAM parity =="
timeout 1500 python -m npore_tpu.cli.realign --bam tests/data/reads.bam \
    --ref tests/data/ref.fasta --out_prefix "$OUT/realign" \
    --stats_dir guppy5_stats > "$OUT/realign.log" 2>&1 || { echo FAIL; exit 1; }
python - "$OUT/realign.sam" <<'EOF' || exit 1
import sys
def load(p):
    return {l.split('\t')[0]: l.rstrip('\n').split('\t')
            for l in open(p) if not l.startswith('@')}
a, b = load(sys.argv[1]), load('tests/data/npore_realigned.sam')
assert set(a) == set(b) and all(a[q][:11] == b[q][:11] for q in a), "MISMATCH"
print("golden SAM 10/10 all-field exact")
EOF

echo "== 2/5 fuzz parity (60 cases) =="
timeout 2400 python scripts/fuzz_parity.py 60 > "$OUT/fuzz.log" 2>&1 \
    || { tail -3 "$OUT/fuzz.log"; echo FAIL; exit 1; }
tail -2 "$OUT/fuzz.log"

echo "== 3/5 engine bench =="
timeout 2400 python scripts/bench_engine.py > "$OUT/engine.log" 2>&1 \
    || { tail -3 "$OUT/engine.log"; echo FAIL; exit 1; }
tail -3 "$OUT/engine.log"

echo "== 4/5 e2e bench (timing breakdown) =="
NPORE_TIMING=1 timeout 2400 python bench.py > "$OUT/bench.log" 2>&1 \
    || { tail -3 "$OUT/bench.log"; echo FAIL; exit 1; }
grep -E "timing|\{" "$OUT/bench.log" | tail -4

echo "== 5/5 done; logs in $OUT =="
