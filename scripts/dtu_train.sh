#!/usr/bin/env bash
# DTU training recipe (the reference's scripts/train.sh on a TPU mesh).
# Data parallelism comes from the jax device mesh — no torchrun/NCCL.
datapath="${DTU_TRAINING:-/data/dtu_training}"
log_dir="${LOG_DIR:-checkpoints/dmvsnet_tpu}"
mkdir -p "$log_dir"

python -m dmvsnet_tpu.cli \
    --preset dtu_train \
    --datapath "$datapath" \
    --log_dir "$log_dir" \
    "$@" | tee -a "$log_dir/log.txt"
