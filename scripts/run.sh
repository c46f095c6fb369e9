#!/usr/bin/env bash
# Launch wrapper (rebuild of the reference's SLURM run.sh:1-21).
# Usage: ./scripts/run.sh <model> <train|test|ps_train> <data_path> <dataset> [extra flags...]
# The reference launched 4 DDP processes under sbatch; here one process owns
# all local TPU chips via the mesh, and multi-host runs add --multihost with
# the cluster's coordinator env (see jax.distributed).
set -euo pipefail
MODEL=${1:?model}; MODE=${2:?mode}; DATA=${3:-./dataset/}; DS=${4:-cast}
shift 4 || true
exec python -m case_rg_tpu.cli.run --model "$MODEL" --mode "$MODE" \
    --data_path "$DATA" --dataset "$DS" "$@"
