#!/bin/bash
# Mock Clair3 full-model caller (scripts/realign_pipeline.sh:185):
# args <wd> <itr> <ref> <test_chrs>; writes <wd>/merge_output.vcf.gz.
set -eu
wd=${1:?wd}; itr=${2:?itr}; ref=${3:?ref}; chrs=${4:?chrs}
[ -f "$ref" ] || { echo "missing ref"; exit 1; }
python3 "$(dirname "$0")/_emit_vcf.py" "$wd/merge_output.vcf.gz"
