#!/bin/bash
# Pileup purity driver (reference: scripts/purity.sh): measures Gini purity
# for up to four haplotype BAMs via the npore_tpu purity CLI.
# usage: ./purity.sh <out_prefix> <bam1>[,bam2,...] [names]
set -euo pipefail
out=${1:?out_prefix}
bams=${2:?bam list}
names=${3:-}
cd "$(dirname "$0")/.."
args=(--bams "$bams" --out_prefix "$out" --plot)
[ -n "$names" ] && args+=(--names "$names")
python3 -m npore_tpu.cli.purity "${args[@]}"
