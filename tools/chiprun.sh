#!/bin/bash
# Round-3 chip-time sequence: run after the axon TPU tunnel returns.
# Each step appends to CHIPRUN.log; artifacts land in the repo root.
set -x
cd /root/repo
{
  date
  echo "=== 1. opprobe (costreg/feature conv variants) ==="
  timeout 3600 python tools/opprobe.py --iters=12
  echo "=== 2. stagetime (roofline columns; folded convs live) ==="
  timeout 3600 python tools/stagetime.py --iters=12
  echo "=== 3. numerics check (DEFAULT vs HIGHEST vs XLA) ==="
  timeout 7200 python tools/numerics_check.py --epipolar
  echo "=== 4. bench default ==="
  timeout 3600 python bench.py --iters=8
  echo "=== 5. bench epipolar ==="
  timeout 3600 python bench.py --iters=8 --epipolar
  echo "=== 6. bench train ==="
  timeout 5400 python bench.py --train --iters=6 | tee BENCH_TRAIN_r03.json
  date
} >> /root/repo/CHIPRUN.log 2>&1
