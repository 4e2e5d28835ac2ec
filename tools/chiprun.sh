#!/bin/bash
# Round-3 chip-time sequence: run when the axon TPU tunnel returns.
# ORDER MATTERS: the driver reruns bench.py at round end, so warming the
# exact bench program's compile cache comes first; diagnostics after.
set -x
cd /root/repo
{
  date
  echo "=== 1. bench default (warms the driver's exact program) ==="
  timeout 5400 python bench.py --iters=8 \
    || { echo "RETRY without DMA pipelining";
         DMVSNET_DMA_PIPELINE=0 timeout 5400 python bench.py --iters=8; }
  echo "=== 2. bench epipolar ==="
  timeout 5400 python bench.py --iters=8 --epipolar
  echo "=== 3. stagetime (roofline; folded A/B; epipolar entries) ==="
  timeout 5400 python tools/stagetime.py --iters=12
  echo "=== 4. bench train -> BENCH_TRAIN_r03.json ==="
  timeout 5400 python bench.py --train --iters=6 | tail -1 | tee BENCH_TRAIN_r03.json
  echo "=== 5. numerics check (DEFAULT vs HIGHEST vs XLA vs epipolar) ==="
  timeout 7200 python tools/numerics_check.py --epipolar
  echo "=== 6. opprobe (conv variant micro-probes) ==="
  timeout 3600 python tools/opprobe.py --iters=12
  date
} >> /root/repo/CHIPRUN.log 2>&1
