#!/usr/bin/env bash
# Rebuild of the reference's evaluate.sh:1-20 (CPU metric pass).
# Usage: ./scripts/evaluate.sh <model> <data_path> [datasets]
set -euo pipefail
MODEL=${1:?model}; DATA=${2:-./dataset/}; DS=${3:-cast}
exec env JAX_PLATFORMS=cpu python -m case_rg_tpu.cli.evaluate \
    --model "$MODEL" --data_path "$DATA" --datasets "$DS"
