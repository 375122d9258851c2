#!/bin/bash
# hap.py accuracy harness (reference: scripts/happy.sh): sweeps hap.py
# (vcfeval engine) over call-VCF x truth-VCF x BED strata produced by the
# bed CLI. Requires hap.py + rtg-tools on PATH (external evaluation tools).
#
# usage: ./happy.sh <truth.vcf> <ref.fasta> <bed_prefix> <out_dir> <call1.vcf> [call2.vcf ...]
set -euo pipefail

truth=${1:?truth vcf}
ref=${2:?ref fasta}
bedpre=${3:?bed prefix (from the bed CLI)}
outdir=${4:?output dir}
shift 4

mkdir -p "$outdir"
jobs=${HAPPY_JOBS:-$(nproc)}

run_one() {
  local call=$1 bed=$2 tag=$3
  hap.py "$truth" "$call" \
    -r "$ref" \
    -T "$bed" \
    -o "$outdir/$(basename "${call%.vcf*}")_${tag}" \
    --engine vcfeval --pass-only
}
export -f run_one
export truth ref outdir

beds=()
tags=()
for n in 0 1 2 3 4 5 6 all; do
  b="${bedpre}_${n}.bed"
  [ -f "$b" ] && { beds+=("$b"); tags+=("np${n}"); }
done

for call in "$@"; do
  for i in "${!beds[@]}"; do
    echo "run_one $call ${beds[$i]} ${tags[$i]}"
  done
done | xargs -P "$jobs" -I{} bash -c '{}'
