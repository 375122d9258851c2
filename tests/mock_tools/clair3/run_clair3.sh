#!/bin/bash
# Mock Clair3 pileup caller: validates the flag shape the pipeline passes
# (scripts/realign_pipeline.sh:127-130) and emits $MOCK_CLAIR3_VCF as
# <output>/pileup.vcf.gz (+ .tbi).
set -eu
out=""
for a in "$@"; do
  case "$a" in
    --output=*) out="${a#--output=}" ;;
    --bam_fn=*) [ -f "${a#--bam_fn=}" ] || { echo "missing bam"; exit 1; } ;;
    --ref_fn=*) [ -f "${a#--ref_fn=}" ] || { echo "missing ref"; exit 1; } ;;
  esac
done
[ -n "$out" ] || { echo "run_clair3.sh: no --output"; exit 1; }
python3 "$(dirname "$0")/_emit_vcf.py" "$out/pileup.vcf.gz"
