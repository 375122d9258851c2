#!/bin/bash
# Mock Clair3 retraining stage 'generate_pileup_tensors': records the invocation for the test.
set -eu
mkdir -p "${6:-${1:?outdir}}" 2>/dev/null || true
echo "generate_pileup_tensors $*" >> "${MOCK_CLAIR3_LOG:-/dev/null}"
