#!/bin/bash
# n-polymer BED driver (reference: scripts/calc_beds.sh), pointed at the
# npore_tpu bed CLI instead of src/bed.py.
# usage: ./calc_beds.sh <ref.fasta> <regions.bed> <out_prefix>
set -euo pipefail
ref=${1:?ref.fasta}
bed=${2:?regions.bed}
out=${3:?out_prefix}
cd "$(dirname "$0")/.."
python3 -m npore_tpu.cli.bed --ref "$ref" --bed "$bed" --out_prefix "$out"
