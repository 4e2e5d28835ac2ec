#!/bin/bash
# FINAL chip step of a round — run AFTER the last code commit that can
# touch the shipped eval path (VERDICT r4 #1/#7).  Produces:
#   * STAGETIME.json stamped with the final HEAD (bench refuses stale
#     attribution, so stage_ms would otherwise be null in BENCH_r{N});
#   * a hot persistent-cache entry for the EXACT default bench program
#     (r4's official bench timed out rc=124 on a cold full-res compile),
#     verified by requiring the second bench run to finish fast.
set -x
cd /root/repo
{
  date
  echo "=== final stagetime at HEAD ($(git rev-parse --short HEAD)) ==="
  timeout 5400 python -u tools/stagetime.py --iters=12
  echo "=== bench run 1 (compiles + caches the default program) ==="
  timeout 5400 python -u bench.py --iters=8
  echo "=== bench run 2 (MUST be fast: proves the driver's run is warm) ==="
  t0=$(date +%s)
  timeout 1800 python -u bench.py --iters=8
  echo "bench run 2 wall: $(( $(date +%s) - t0 ))s (driver-safe if <<1800)"
  date
} >> /root/repo/CHIPFINAL.log 2>&1
