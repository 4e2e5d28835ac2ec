#!/usr/bin/env bash
# DTU depth inference + pcd fusion (the reference's scripts/dtu_test.sh).
datapath="${DTU_EVAL:-/data/dtu_eval}"
outdir="${OUTDIR:-outputs_dtu}"
resume="${RESUME:?set RESUME to a checkpoint path}"

python -m dmvsnet_tpu.cli \
    --test --preset dtu_test \
    --datapath "$datapath" \
    --outdir "$outdir" \
    --resume "$resume" \
    "$@"
