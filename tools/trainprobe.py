"""Bisect the composed-train-step slowness (r4: components sum ~0.6 s,
composed step 7.1-7.6 s at the 512x640 b=2 recipe).

Times, each as its own amortized in-jit loop at the train recipe:
  fwd        model.apply(train=True) + mvs_loss            (no grad)
  fwdbwd     value_and_grad of the same                    (no Adam)
  step       the full train step (grad + Adam + metrics)
  fwd_nofeat same fwd but from precomputed features?  (skipped — the
             feature net is inside apply; prefix timings cover it)

Usage: python tools/trainprobe.py [--iters=N] [--remat]
Writes TRAINPROBE.json.
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


def time_amortized(fn, args, iters, carry_update=None):
    """fn(*args) -> scalar; one jit dispatch of `iters` calls."""

    @jax.jit
    def many(n, *args):
        def body(i, acc):
            out = fn(args[0] + acc * 1e-20 if carry_update is None else args[0],
                     *args[1:])
            return acc + out

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(1), *args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(iters), *args)))
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 4))
    remat = "--remat" in sys.argv
    from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
    from dmvsnet_tpu.engine.steps import make_train_step
    from dmvsnet_tpu.losses.mvs_loss import mvs_loss
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.ops.pallas import warp_correlate
    from dmvsnet_tpu.utils import synthetic

    warp_correlate.MATMUL_PRECISION = jax.lax.Precision.DEFAULT
    n_batch = int(next((a.split("=")[1] for a in sys.argv
                        if a.startswith("--batch=")), 2))
    model = MVSNet(ndepths=(48, 32, 8), depth_interval_ratio=(4, 2, 1),
                   inverse_depth=True, use_pallas_warp=True, remat=remat)
    hh = int(next((a.split("=")[1] for a in sys.argv
                   if a.startswith("--height=")), 512))
    ww = int(next((a.split("=")[1] for a in sys.argv
                   if a.startswith("--width=")), 640))
    batch_np = synthetic.make_batch(batch=n_batch, n_views=5, height=hh,
                                    width=ww, n_depths=192)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    lr = make_lr_schedule(1e-3, steps_per_epoch=1000)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, lr)
    step = make_train_step(lr_schedule=lr, jit=False)
    results = {}

    def loss_of(params, batch_stats, imgs):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, batch["proj_matrices"], batch["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        return mvs_loss(out, batch["depth"], batch["mask"], "regression",
                        (0.5, 1.0, 2.0))

    def fwd(imgs):
        return loss_of(state.params, state.batch_stats, imgs)

    dt, c = time_amortized(fwd, (batch["imgs"],), iters)
    results["fwd"] = round(dt * 1e3, 1)
    print(f"fwd     {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)

    def fwd_eval_mode(imgs):
        # same shapes/program as `fwd` but train=False: BN uses running
        # stats (folded scale-shift) instead of batch statistics.  A/Bs
        # whether the composed-fwd slowdown is the BN train-mode graph.
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, batch["proj_matrices"], batch["depth_values"], train=False,
        )
        return mvs_loss(out, batch["depth"], batch["mask"], "regression",
                        (0.5, 1.0, 2.0))

    dt, c = time_amortized(fwd_eval_mode, (batch["imgs"],), iters)
    results["fwd_eval_mode"] = round(dt * 1e3, 1)
    print(f"fwd_eval_mode {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)

    def fwdbwd(imgs):
        l, g = jax.value_and_grad(
            lambda p: loss_of(p, state.batch_stats, imgs))(state.params)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, jnp.float32(0.0))

    dt, c = time_amortized(fwdbwd, (batch["imgs"],), iters)
    results["fwdbwd"] = round(dt * 1e3, 1)
    print(f"fwdbwd  {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)

    # ---- bisect rows: is the extra composed-bwd time in mvs_loss or in
    # the model's own backward?  (STAGETIME_grad sums only feature/warp/
    # costreg — loss/heads/sampling bwd were never in the parts sum.)
    def raw_outputs(params, batch_stats, imgs):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, batch["proj_matrices"], batch["depth_values"],
            train=True, mutable=["batch_stats"],
        )
        return out

    def fwdbwd_noloss(imgs):
        def scalar_of(p):
            out = raw_outputs(p, state.batch_stats, imgs)
            # full-model cotangents without mvs_loss internals: a fixed
            # pseudo-loss over exactly the tensors mvs_loss consumes
            acc = jnp.float32(0.0)
            for k in out:
                if k.startswith("stage"):
                    acc = acc + jnp.sum(jnp.sin(out[k]["depth_sub_plus"] * 1e-3))
                    acc = acc + jnp.sum(
                        jnp.sin(out[k]["depth_sub_plus_refine"] * 1e-3))
            return acc

        l, g = jax.value_and_grad(scalar_of)(state.params)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, jnp.float32(0.0))

    dt, c = time_amortized(fwdbwd_noloss, (batch["imgs"],), iters)
    results["fwdbwd_noloss"] = round(dt * 1e3, 1)
    print(f"fwdbwd_noloss {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)

    # loss-only fwd+bwd: model outputs fixed as jit ARGS (layout-clean
    # program entry, like every STAGETIME_grad component row)
    out_all = jax.jit(raw_outputs)(state.params, state.batch_stats,
                                   batch["imgs"])
    out_fixed = jax.block_until_ready({
        k: {"depth_sub_plus": v["depth_sub_plus"],
            "depth_sub_plus_refine": v["depth_sub_plus_refine"]}
        for k, v in out_all.items()
        if isinstance(v, dict) and "depth_sub_plus" in v
    })

    def loss_only(d1sub, outputs):
        outputs = dict(outputs)
        s1 = dict(outputs["stage1"])
        s1["depth_sub_plus"] = d1sub  # perturbed via the amortizing carry
        outputs["stage1"] = s1
        l, g = jax.value_and_grad(
            lambda o: mvs_loss(o, batch["depth"], batch["mask"],
                               "regression", (0.5, 1.0, 2.0)))(outputs)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, jnp.float32(0.0))

    dt, c = time_amortized(
        loss_only, (out_fixed["stage1"]["depth_sub_plus"], out_fixed), iters)
    results["loss_only_fwdbwd"] = round(dt * 1e3, 1)
    print(f"loss_only_fwdbwd {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)

    @jax.jit
    def many_step(n, st):
        def body(i, s):
            s2, scalars, _ = step(s, batch)
            return s2

        st = jax.lax.fori_loop(0, n, body, st)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
            st.params, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(many_step(jnp.int32(1), state)))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(many_step(jnp.int32(iters), state)))
    dt = (time.perf_counter() - t0) / iters
    results["step"] = round(dt * 1e3, 1)
    print(f"step    {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)

    results["remat"] = remat
    results["batch"] = n_batch
    results["image"] = [hh, ww]
    with open("/root/repo/TRAINPROBE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
