#!/bin/bash
# Mock Clair3 retraining stage 'train_full_model': records the invocation for the test.
set -eu
mkdir -p "${6:-${1:?outdir}}" 2>/dev/null || true
echo "train_full_model $*" >> "${MOCK_CLAIR3_LOG:-/dev/null}"
