#!/bin/bash
# Round-4 second chip pass: batch benches on the chunked-feature fix,
# train-grad attribution, bf16-costreg A/Bs, opprobe.
set -x
cd /root/repo

run2() {
  local t=$1; shift
  timeout "$t" "$@" || {
    echo "RETRY without DMA pipelining: $*"
    DMVSNET_DMA_PIPELINE=0 timeout "$t" "$@"
  }
}

{
  date
  echo "=== A. bench B=2 / B=4 (chunked feature) ==="
  run2 5400 python -u bench.py --iters=8 --batch=2 | tail -1 | tee BENCH_B2.json
  run2 5400 python -u bench.py --iters=6 --batch=4 | tail -1 | tee BENCH_B4.json
  echo "=== B. stagetime --grad (train fwd+bwd attribution) ==="
  run2 5400 python -u tools/stagetime.py --grad --iters=6
  echo "=== C. bf16 costreg A/B: bench + numerics gate ==="
  run2 5400 python -u bench.py --iters=8 --costreg-bf16 | tail -1 | tee BENCH_CRBF16.json
  run2 7200 python -u tools/numerics_check.py --epipolar --costreg-bf16 --feature-bf16
  echo "=== D. opprobe (conv variant micro-probes incl. dual2x) ==="
  run2 3600 python -u tools/opprobe.py --iters=12
  date
} >> /root/repo/CHIPRUN2.log 2>&1
