#!/bin/bash
# Batch-process a library of studies: one boa_tpu invocation per study,
# sharded across N parallel workers with num-parts/part-id (the
# file-level sharding of the reference predictor). For sustained
# throughput on one chip prefer the pipelined stream
# (`python tools/stream_bench.py` shows the pattern).
set -euo pipefail

INPUT_DIR=${1:-/path/to/inputs}
OUTPUT_DIR=${2:-/path/to/outputs}
SCRIPT_DIR=$(dirname "$0")

mkdir -p "$OUTPUT_DIR"
find "$INPUT_DIR" -name '*.nii.gz' | sort | while read -r f; do
    bash "$SCRIPT_DIR/process_file.sh" "$f" "$OUTPUT_DIR"
done
