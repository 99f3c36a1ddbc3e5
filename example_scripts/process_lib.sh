#!/bin/bash
# Batch-process a library of studies laid out as inputs/<study_id>/image.nii.gz
# (one directory per study, like the reference's process_lib.sh): one
# boa_tpu invocation per study, continuing past failures. For sustained
# throughput on one chip prefer the pipelined stream
# (`python tools/stream_bench.py` shows the pattern).
set -uo pipefail

INPUT_DIR=${1:-/path/to/inputs}
OUTPUT_DIR=${2:-/path/to/outputs}
SCRIPT_DIR=$(dirname "$0")

mkdir -p "$OUTPUT_DIR"
for d in "$INPUT_DIR"/*/; do
    f=$(find "$d" -maxdepth 1 -name '*.nii.gz' | head -1)
    [ -z "$f" ] && continue
    bash "$SCRIPT_DIR/process_file.sh" "$f" "$OUTPUT_DIR" \
        || echo "failed: $f" >&2
done
