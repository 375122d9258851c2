#!/bin/bash
# Mock Clair3 retraining stage 'generate_full_tensors': records the invocation for the test.
set -eu
mkdir -p "${6:-${1:?outdir}}" 2>/dev/null || true
echo "generate_full_tensors $*" >> "${MOCK_CLAIR3_LOG:-/dev/null}"
