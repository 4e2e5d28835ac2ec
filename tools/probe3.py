"""Probe the stage-3 composed-vs-isolated timing gap and bf16 per-op.

STAGETIME_prefix.json shows the composed model spends ~450 ms in stage 3
while the isolated component timings (STAGETIME.json) sum to ~217 ms.
This probe times the CHAINED pallas-warp -> CostRegNet pair in one jit
(the interface the composed graph actually runs) and bf16 variants of
the two conv cost centers, to localize where the extra time lives.

Usage: python tools/probe3.py [--iters=N] [--only=substr]
Writes PROBE3.json.
"""

from __future__ import annotations


# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dmvsnet_tpu.models.cost_reg import CostRegNet  # noqa: E402
from dmvsnet_tpu.models.feature_net import FeatureNet  # noqa: E402
from dmvsnet_tpu.utils import synthetic  # noqa: E402

SMALL = "--small" in sys.argv  # CPU smoke test of the probe itself
if SMALL:
    jax.config.update("jax_platforms", "cpu")
    H, W, V = 64, 128, 3
else:
    H, W, V = 864, 1152, 5
D3, C3 = 8, 8


def time_amortized(fn, args, iters: int):
    @jax.jit
    def many(n, *args):
        def body(i, acc):
            out = fn(args[0] + acc * 1e-20, *args[1:])
            leaves = [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(out)]
            return acc + sum(leaves)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(1), *args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(iters), *args)))
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 8))
    only = next((a.split("=")[1] for a in sys.argv
                 if a.startswith("--only=")), "")
    import functools

    from dmvsnet_tpu.ops.pallas import aggregate_cost_volume_pallas as _acvp
    from dmvsnet_tpu.ops.pallas import warp_correlate

    warp_correlate.MATMUL_PRECISION = jax.lax.Precision.DEFAULT
    aggregate_cost_volume_pallas = functools.partial(_acvp, interpret=SMALL)

    key = jax.random.PRNGKey(0)
    batch = synthetic.make_batch(batch=1, n_views=V, height=H, width=W,
                                 n_depths=192)
    proj3 = jnp.asarray(batch["proj_matrices"]["stage3"])
    dv = jnp.asarray(batch["depth_values"])
    mid = jnp.full((1, H, W), float(dv[0, dv.shape[1] // 2]))
    samples = jnp.stack(
        [mid + (i - D3 / 2) * 2.0 for i in range(D3)], axis=1)  # (1,D,H,W)

    feats = [jax.random.normal(jax.random.PRNGKey(i), (1, H, W, C3), jnp.float32)
             for i in range(V)]

    cost_shape = (1, D3, H, W, 2)
    cost_rand = jax.random.normal(key, cost_shape, jnp.float32)

    results = []

    def add(name, fn, args, it=iters):
        if only and only not in name:
            return
        dt, cs = time_amortized(fn, args, it)
        results.append({"name": name, "ms": round(dt * 1e3, 3)})
        print(f"{name:36s} {dt*1e3:9.3f} ms  (compile {cs:.1f}s)", flush=True)

    # --- controls ---
    def warp_fn(f0, *rest):
        return aggregate_cost_volume_pallas([f0, *rest], proj3, samples)

    add("warp3 alone", warp_fn, tuple(feats))

    reg = CostRegNet(8)
    rv = reg.init(key, cost_rand)

    def reg_fn(cost):
        return reg.apply(rv, cost)

    add("costreg3 alone (random input)", reg_fn, (cost_rand,))

    # --- the chained interface the composed model runs ---
    def chain_fn(f0, *rest):
        cost = aggregate_cost_volume_pallas([f0, *rest], proj3, samples)
        return reg.apply(rv, cost)

    add("warp3 -> costreg3 chained", chain_fn, tuple(feats))

    # --- bf16 variants of the conv cost centers ---
    regb = CostRegNet(8, dtype=jnp.bfloat16)
    rvb = regb.init(key, cost_rand.astype(jnp.bfloat16))
    costb = cost_rand.astype(jnp.bfloat16)

    def regb_fn(cost):
        return regb.apply(rvb, cost)

    add("costreg3 bf16", regb_fn, (costb,))

    imgs = jax.random.normal(key, (V, H, W, 3), jnp.float32)
    fnet = FeatureNet(8)
    fvars = fnet.init(key, imgs[:1])

    def feat_fn(x):
        return fnet.apply(fvars, x)

    add("feature fp32", feat_fn, (imgs,))

    # --- feature -> warp chained (tests the feats-side interface) ---
    def feat_warp_fn(x):
        f = fnet.apply(fvars, x)["stage3"]
        views = [f[i:i + 1] for i in range(V)]
        return aggregate_cost_volume_pallas(views, proj3, samples)

    add("feature -> warp3 chained", feat_warp_fn, (imgs,))

    fnetb = FeatureNet(8, dtype=jnp.bfloat16)
    fvarsb = fnetb.init(key, imgs[:1].astype(jnp.bfloat16))
    imgsb = imgs.astype(jnp.bfloat16)

    def featb_fn(x):
        return fnetb.apply(fvarsb, x)

    add("feature bf16", featb_fn, (imgsb,))

    with open("/root/repo/PROBE3.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
