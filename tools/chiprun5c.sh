#!/bin/bash
# Round-5 sequence C: after the measured routing flip (epi main s1-2,
# 2-D elsewhere) and the eval-BN-in-block-dtype change.  Value order:
#   1. bench default      (the new shipped headline candidate)
#   2. numerics regate    (BN + routing changed shipped outputs -> all
#                          gate keys must be re-measured on chip)
#   3. stagetime at HEAD  (no --xla-rows; bf16 defaults; fits timeout)
#   4. train bf16         (the DMA-mismatch fix landed; capacity row)
#   5. parity_e2e         (chip-vs-torch depth->fusion->eval)
#   6. tank smoke         (T&T shape envelope + dypcd routing)
# FINAL: tools/chipfinal.sh after the LAST code commit.
set -x
cd /root/repo

run2() {  # run2 <timeout> <cmd...>: retry once with DMA pipelining off
  local t=$1; shift
  timeout "$t" "$@" || {
    echo "RETRY without DMA pipelining: $*"
    DMVSNET_DMA_PIPELINE=0 timeout "$t" "$@"
  }
}

{
  date
  echo "=== 1. bench default (HEAD $(git rev-parse --short HEAD)) ==="
  run2 5400 python -u bench.py --iters=8
  echo "=== 2. numerics regate (all shipped-default gates) ==="
  run2 10800 python -u tools/numerics_check.py --epipolar --costreg-bf16 --feature-bf16
  echo "=== 3. stagetime at HEAD ==="
  run2 5400 python -u tools/stagetime.py --iters=12
  echo "=== 4. train: bf16 + remat (DMA fix) ==="
  { timeout 5400 python -u bench.py --train --iters=6 --remat --bf16 \
    || { echo "RETRY with DMA pipelining off";
         DMVSNET_DMA_PIPELINE=0 timeout 5400 python -u bench.py --train --iters=6 --remat --bf16; }
  } | tail -1 | tee BENCH_TRAIN_BF16.json
  echo "=== 5. parity e2e (chip + torch CPU) -> PARITY_E2E.json ==="
  run2 10800 python -u tools/parity_e2e.py
  echo "=== 6. tank smoke -> TANK_SMOKE.json ==="
  run2 10800 python -u tools/tank_smoke.py
  date
} >> /root/repo/CHIPRUN5.log 2>&1
