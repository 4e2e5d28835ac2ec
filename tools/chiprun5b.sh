#!/bin/bash
# Round-5 session-2 chip sequence.  Session 1 already produced on chip:
# NUMERICS.json (all shipped-default gates incl. feature-bf16), bench
# default 3.457 maps/s, train remat 0.1483 steps/s.  This sequence
# finishes the proof chain (VERDICT r4 #3/#4/#5/#6/#7) in value order:
#   1. bench default        (cache-warm check at the new HEAD)
#   2. train capacity sweep (bf16 / batch-1 / fp32 remat rows, each with
#                            XLA memory_analysis peak -> the quantified
#                            HBM-cliff proof + v5p projection)
#   3. stagetime            (fresh git-stamped attribution at HEAD)
#   4. parity_e2e           (chip-vs-torch depth->fusion->eval)
#   5. tank smoke           (T&T shape envelope + dypcd routing)
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
  echo "=== 2a. train: bf16 + remat ==="
  run2 5400 python -u bench.py --train --iters=6 --remat --bf16 | tail -1 | tee BENCH_TRAIN_BF16.json
  echo "=== 2b. train: fp32 remat batch=1 (capacity isolation) ==="
  run2 5400 python -u bench.py --train --iters=6 --remat --train-batch=1 | tail -1 | tee BENCH_TRAIN_B1.json
  echo "=== 2c. train: fp32 remat batch=2 (the recipe; + hbm peak) ==="
  run2 5400 python -u bench.py --train --iters=6 --remat | tail -1 | tee BENCH_TRAIN_r05.json
  echo "=== 3. stagetime (roofline attribution at HEAD) ==="
  run2 5400 python -u tools/stagetime.py --iters=12
  echo "=== 4. parity e2e (chip + torch CPU) -> PARITY_E2E.json ==="
  run2 10800 python -u tools/parity_e2e.py
  echo "=== 5. tank smoke -> TANK_SMOKE.json ==="
  run2 10800 python -u tools/tank_smoke.py
  date
} >> /root/repo/CHIPRUN5.log 2>&1
