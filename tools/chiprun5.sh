#!/bin/bash
# Round-5 chip-time sequence (VERDICT r4: a perf-and-proof round).
# ORDER = VALUE: what the judge needs most comes first, so a tunnel drop
# mid-sequence still leaves the round provable.
#   1. tier smoke      (cheap compiles; catches VJP tier crashes)
#   2. numerics        (ALL shipped-default gates: epipolar + costreg-bf16
#                       + feature-bf16 + geometry-precision -> NUMERICS.json;
#                       the suite FAILS on a missing gate key now)
#   3. bench default   (warms the driver's exact round-end program)
#   4. train bench     (feature-net remat A/B -> BENCH_TRAIN_r05.json)
#   5. stagetime       (fresh git-stamped attribution + A/B rows)
#   6. bench variants  (B=4 retry under the bf16 nets, epipolar A/B)
#   7. parity_e2e      (chip-vs-torch depth->fusion->eval, PARITY_E2E.json)
#   8. tank smoke      (T&T shape envelope + dypcd + engagement routing)
# FINAL (run separately after the LAST code commit): tools/chipfinal.sh
# — stagetime at HEAD, then bench twice so the persistent cache holds the
# exact default program (r4's rc=124 was a cold full-res compile).
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
  echo "=== 1. tier smoke (compiled, all VJP tiers) ==="
  run2 1800 python -u tools/tier_smoke.py
  echo "=== 2. numerics (all shipped-default gates) ==="
  run2 10800 python -u tools/numerics_check.py --epipolar --costreg-bf16 --feature-bf16
  echo "=== 3. bench default ==="
  run2 5400 python -u bench.py --iters=8
  echo "=== 4. train bench (remat incl. feature-net checkpoint) ==="
  { timeout 5400 python -u bench.py --train --iters=6 --remat \
    || { echo "RETRY with DMA pipelining off";
         DMVSNET_DMA_PIPELINE=0 timeout 5400 python -u bench.py --train --iters=6 --remat; }
  } | tail -1 | tee BENCH_TRAIN_r05.json
  echo "=== 5. stagetime (roofline attribution) ==="
  run2 5400 python -u tools/stagetime.py --iters=12
  echo "=== 5b. stagetime --grad (train fwd+bwd attribution) ==="
  run2 5400 python -u tools/stagetime.py --grad --iters=6
  echo "=== 6. bench variants: B=4 (bf16 nets may fit now), epipolar A/B ==="
  run2 5400 python -u bench.py --iters=8 --batch=4 | tail -1 | tee BENCH_B4.json
  run2 5400 python -u bench.py --iters=8 --no-epipolar
  echo "=== 7. parity e2e (chip + torch CPU) -> PARITY_E2E.json ==="
  run2 10800 python -u tools/parity_e2e.py
  echo "=== 8. tank smoke -> TANK_SMOKE.json ==="
  run2 10800 python -u tools/tank_smoke.py
  date
} >> /root/repo/CHIPRUN5.log 2>&1
