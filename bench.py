"""Benchmark: depth-map inference throughput at the DTU eval config.

Measures the flagship cascade (ndepths 48/32/8, interval_ratio 4/2/1,
inverse depth, 5 views, 1152x864 — reference scripts/dtu_test.sh:8-30)
on the available accelerator and prints ONE JSON line:

  {"metric": "dtu_depth_maps_per_s", "value": N, "unit": "maps/s",
   "vs_baseline": N}

vs_baseline is measured throughput divided by an A100 ESTIMATE for the
PyTorch reference (the repo publishes no numbers — BASELINE.md; the
estimate is derived from per-iteration wall-times of comparable cascade
MVS models).  Replace A100_EST_MAPS_PER_S with a measured value when the
reference is benchmarked for real; the driver target is vs_baseline >= 3.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# ESTIMATE (not measured): cascade-MVS nets of this size run ~0.25-0.45 s
# per 1152x864 5-view depth map on an A100 in fp32 torch eager.
A100_EST_MAPS_PER_S = 3.3

HEIGHT, WIDTH, VIEWS = 864, 1152, 5
NDEPTHS = (48, 32, 8)


def build(dtype=jnp.float32, height=HEIGHT, width=WIDTH, views=VIEWS):
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.utils import synthetic

    model = MVSNet(
        ndepths=NDEPTHS, depth_interval_ratio=(4, 2, 1), inverse_depth=True,
        dtype=dtype,
    )
    batch = synthetic.make_batch(
        batch=1, n_views=views, height=height, width=width, n_depths=192
    )
    imgs = jnp.asarray(batch["imgs"])
    proj = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])
    variables = model.init(jax.random.PRNGKey(0), imgs, proj, dv)

    @jax.jit
    def infer(params, batch_stats, imgs, proj, dv):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, proj, dv,
            train=False,
        )
        return out["depth"], out["photometric_confidence"]

    args = (variables["params"], variables["batch_stats"], imgs, proj, dv)
    return infer, args


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    iters = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--iters=")), 8))

    infer, args = build(dtype=dtype)
    out = infer(*args)
    jax.block_until_ready(out)  # compile
    for _ in range(2):
        out = infer(*args)
    jax.block_until_ready(out)  # warm

    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    maps_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "dtu_depth_maps_per_s",
                "value": round(maps_per_s, 3),
                "unit": "maps/s",
                "vs_baseline": round(maps_per_s / A100_EST_MAPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
