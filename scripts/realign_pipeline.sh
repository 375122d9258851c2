#!/bin/bash
# End-to-end variant-caller retraining pipeline (reference:
# scripts/realign_pipeline.sh, with its hardcoded cluster paths replaced by
# arguments and the nPoRe CLIs replaced by the npore_tpu equivalents).
#
# Stages (toggle via env flags, all default off like the reference's
# booleans at scripts/realign_pipeline.sh:3-16):
#   STAGE_ALIGN=1      minimap2 alignment of the input fastq
#   STAGE_PHASE=1      whatshap phase + haplotag
#   STAGE_STD_VCF=1    standardize the truth VCF
#   STAGE_REALIGN=1    npore_tpu realignment of the haplotagged BAM
#   STAGE_CALL=1       clair3 candidate generation / calling
#
# External tools (minimap2, samtools, whatshap, clair3) must be on PATH;
# they are deployment dependencies, not bundled here.
#
# usage: ./realign_pipeline.sh <workdir> <reads.fastq> <ref.fasta> <truth.vcf> <stats_dir>
set -euo pipefail

wd=${1:?workdir}
fastq=${2:?reads.fastq}
ref=${3:?ref.fasta}
truth=${4:?truth.vcf}
stats=${5:?stats_dir}
here=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$wd"

if [ "${STAGE_ALIGN:-0}" = 1 ]; then
  echo "== align =="
  "$here/align.sh" "$fastq" "$ref" "$wd/aln"
fi

if [ "${STAGE_PHASE:-0}" = 1 ]; then
  echo "== phase + haplotag =="
  whatshap phase -o "$wd/phased.vcf.gz" --reference "$ref" "$truth" "$wd/aln.bam"
  tabix -f -p vcf "$wd/phased.vcf.gz"
  whatshap haplotag -o "$wd/tagged.bam" --reference "$ref" \
      "$wd/phased.vcf.gz" "$wd/aln.bam"
  samtools index "$wd/tagged.bam"
  python3 "$here/tag_unphased.py" "$wd/tagged.bam" "$wd/tagged_all.sam"
fi

if [ "${STAGE_STD_VCF:-0}" = 1 ]; then
  echo "== standardize truth VCF =="
  python3 -m npore_tpu.cli.standardize_vcf \
      --vcf "$truth" --ref "$ref" --out_prefix "$wd/std" --stats_dir "$stats"
fi

if [ "${STAGE_REALIGN:-0}" = 1 ]; then
  echo "== realign =="
  python3 -m npore_tpu.cli.realign \
      --bam "$wd/tagged.bam" --ref "$ref" \
      --out_prefix "$wd/realigned" --stats_dir "$stats"
  "$here/align.sh" "$wd/realigned.sam" "$ref" "$wd/realigned"
fi

if [ "${STAGE_CALL:-0}" = 1 ]; then
  echo "== clair3 =="
  run_clair3.sh --bam_fn="$wd/realigned.bam" --ref_fn="$ref" \
      --threads="$(nproc)" --platform=ont \
      --model_path="${CLAIR3_MODEL:?set CLAIR3_MODEL}" \
      --output="$wd/clair3"
fi
