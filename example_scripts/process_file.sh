#!/bin/bash
# Analyze ONE study (NIfTI file or DICOM directory) with boa_tpu,
# skipping studies whose output workbook already exists.
# Parity: example_scripts/process_file.sh of the reference (docker+GPU);
# here the TPU runtime is ambient (JAX picks up the accelerator) so no
# container plumbing is required.
set -euo pipefail

INPUT=$1
OUTPUT_ROOT=$2
# study ID = name of the folder the input lives in (change to taste)
STUDY_ID=$(basename "$(dirname "$INPUT")")
OUTPUT_DIR=$OUTPUT_ROOT/$STUDY_ID
CHECK_NAME="output.xlsx"

if [ -f "$OUTPUT_DIR/$CHECK_NAME" ]; then
    echo "$STUDY_ID already exists"
    exit 0
fi
mkdir -p "$OUTPUT_DIR"
echo "$STUDY_ID is being computed"

python -m boa_tpu \
    -i "$INPUT" \
    -o "$OUTPUT_DIR" \
    -m total+bca \
    --fast-total --fast-bca
