"""Scaling measurements on the virtual 8-device CPU mesh.

Two modes:

  python tools/scaling.py            # dp weak scaling: step time at dp=1/2/4/8
  python tools/scaling.py --sp       # sp=2 vs sp=1 full-res inference parity

No multi-chip TPU hardware is reachable from this harness, so these runs
use XLA:CPU with --xla_force_host_platform_device_count=8 — the same
GSPMD partitioner and collectives as a real mesh, but host-speed math:
treat the dp table as a COLLECTIVE-OVERHEAD measurement (weak scaling,
per-device batch fixed at 1; ideal = flat step time), not as TPU
throughput.  Results land in SCALING.json.
"""

from __future__ import annotations


# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule  # noqa: E402
from dmvsnet_tpu.engine.steps import make_train_step  # noqa: E402
from dmvsnet_tpu.models import MVSNet  # noqa: E402
from dmvsnet_tpu.parallel import make_mesh, shard_batch  # noqa: E402
from dmvsnet_tpu.utils import synthetic  # noqa: E402


def dp_weak_scaling(height=128, width=160, ndepths=(16, 8, 8), iters=6):
    """Step time vs dp size at per-device batch 1 (weak scaling)."""
    results = []
    for n_dp in (1, 2, 4, 8):
        mesh = make_mesh(n_data=n_dp, n_spatial=1)
        model = MVSNet(
            ndepths=ndepths, depth_interval_ratio=(4, 2, 1),
            inverse_depth=True, mesh=mesh,
        )
        batch_np = synthetic.make_batch(
            batch=n_dp, n_views=3, height=height, width=width, n_depths=48
        )
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
        lr = make_lr_schedule(1e-3, steps_per_epoch=10)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, lr)
        step = make_train_step(lr_schedule=lr)
        sharded = shard_batch(batch, mesh)
        state, scalars, _ = step(state, sharded)  # compile + warm
        float(scalars["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, scalars, _ = step(state, sharded)
        float(scalars["loss"])
        dt = (time.perf_counter() - t0) / iters
        eff = results[0]["step_s"] / dt if results else 1.0
        results.append(
            {"dp": n_dp, "global_batch": n_dp, "step_s": round(dt, 4),
             "weak_scaling_eff": round(eff, 3)}
        )
        print(results[-1], flush=True)
    return results


def dp8_isolation(height=128, width=160, ndepths=(16, 8, 8), iters=6):
    """Isolate WHY dp>=4 weak-scaling efficiency collapses on the virtual
    CPU mesh (VERDICT r4 weak #6): compare the dp=8 SHARDED step against
    the SAME total work on ONE device (global batch 8, no mesh, no
    collectives).  The 8 virtual devices share one host's cores, so a
    compute-bound step must slow down ~equally in both configurations;
    if t(dp=8 sharded) ~= t(1 device, batch 8), the collapse is pure
    host-compute oversubscription — a CPU-harness artifact, not a
    property of the GSPMD partition."""

    def timed(mesh, n_batch):
        model = MVSNet(
            ndepths=ndepths, depth_interval_ratio=(4, 2, 1),
            inverse_depth=True, mesh=mesh,
        )
        batch_np = synthetic.make_batch(
            batch=n_batch, n_views=3, height=height, width=width, n_depths=48
        )
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
        lr = make_lr_schedule(1e-3, steps_per_epoch=10)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, lr)
        step = make_train_step(lr_schedule=lr)
        sharded = shard_batch(batch, mesh) if mesh is not None else batch
        state, scalars, _ = step(state, sharded)
        float(scalars["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, scalars, _ = step(state, sharded)
        float(scalars["loss"])
        return (time.perf_counter() - t0) / iters

    t_1dev_b1 = timed(None, 1)
    t_1dev_b8 = timed(None, 8)
    t_dp8_b8 = timed(make_mesh(n_data=8, n_spatial=1), 8)
    res = {
        "single_device_b1_s": round(t_1dev_b1, 4),
        "single_device_b8_s": round(t_1dev_b8, 4),
        "dp8_sharded_b8_s": round(t_dp8_b8, 4),
        # <= ~1 means the GSPMD-partitioned step costs no more than the
        # identical unsharded work on the same silicon: the dp>=4 'eff'
        # collapse in dp_weak_scaling_cpu is host-compute, not collectives
        "collective_overhead_ratio": round(t_dp8_b8 / t_1dev_b8, 3),
        "host_compute_ratio_b8_vs_b1": round(t_1dev_b8 / t_1dev_b1, 3),
    }
    print(res, flush=True)
    return res


def dp8_work_sweep(ndepths=(16, 8, 8), iters=4):
    """Grow per-device work and watch the dp8 overhead ratio (sharded /
    same-work-unsharded).  The virtual-CPU mesh pays a FIXED per-step
    cost per device execution (thread-pool scheduling + a GSPMD barrier
    at every BN psum — ~100 sync points/step shared by 8 device threads
    on oversubscribed cores).  If the collapse were a property of the
    partition itself the ratio would stay flat as work grows; a falling
    ratio pins it on fixed host overhead that real multi-chip meshes
    (one process per chip, hardware collectives over ICI) never pay."""

    def timed(mesh, n_batch, height, width):
        model = MVSNet(
            ndepths=ndepths, depth_interval_ratio=(4, 2, 1),
            inverse_depth=True, mesh=mesh,
        )
        batch_np = synthetic.make_batch(
            batch=n_batch, n_views=3, height=height, width=width, n_depths=48
        )
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
        lr = make_lr_schedule(1e-3, steps_per_epoch=10)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, lr)
        step = make_train_step(lr_schedule=lr)
        sharded = shard_batch(batch, mesh) if mesh is not None else batch
        state, scalars, _ = step(state, sharded)
        float(scalars["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, scalars, _ = step(state, sharded)
        float(scalars["loss"])
        return (time.perf_counter() - t0) / iters

    rows = []
    for h, w in ((64, 96), (128, 160), (256, 320)):
        t_1dev = timed(None, 8, h, w)
        t_dp8 = timed(make_mesh(n_data=8, n_spatial=1), 8, h, w)
        rows.append({
            "height": h, "width": w,
            "single_device_b8_s": round(t_1dev, 4),
            "dp8_sharded_b8_s": round(t_dp8, 4),
            "overhead_ratio": round(t_dp8 / t_1dev, 3),
        })
        print(rows[-1], flush=True)
    return rows


def sp_parity(height=864, width=1152, ndepths=(48, 32, 8)):
    """sp=2 sharded single-sample inference vs unsharded, full DTU res.

    The spatial axis halo-exchanges every conv through GSPMD; parity here
    proves the advertised sp sharding is numerically safe at the real
    eval resolution (VERDICT round-1 weak #3 tested it only at 32x32).
    """
    batch_np = synthetic.make_batch(
        batch=1, n_views=3, height=height, width=width, n_depths=192
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    def run(mesh):
        model = MVSNet(
            ndepths=ndepths, depth_interval_ratio=(4, 2, 1),
            inverse_depth=True, mesh=mesh,
        )
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
            batch["depth_values"],
        )

        @jax.jit
        def infer(variables, imgs, proj, dv):
            out = model.apply(variables, imgs, proj, dv, train=False)
            return out["depth"], out["photometric_confidence"]

        out = infer(
            variables, batch["imgs"], batch["proj_matrices"], batch["depth_values"]
        )
        return jax.tree_util.tree_map(np.asarray, out)

    d1, c1 = run(None)
    mesh = make_mesh(n_data=1, n_spatial=2)
    d2, c2 = run(mesh)
    derr = float(np.max(np.abs(d1 - d2)))
    cerr = float(np.max(np.abs(c1 - c2)))
    print(f"sp=2 vs sp=1 @ {height}x{width}: depth max|d| {derr:.3e}, "
          f"conf max|d| {cerr:.3e}", flush=True)
    assert derr < 1e-3 and cerr < 1e-3, (derr, cerr)
    return {"height": height, "width": width, "depth_max_abs_diff": derr,
            "conf_max_abs_diff": cerr}


def main():
    out = {}
    if "--sp" in sys.argv:
        out["sp_parity_full_res"] = sp_parity()
    elif "--dp-isolate" in sys.argv:
        out["dp8_isolation"] = dp8_isolation()
    elif "--dp-sweep" in sys.argv:
        out["dp8_work_sweep"] = dp8_work_sweep()
    else:
        out["dp_weak_scaling_cpu"] = dp_weak_scaling()
    path = "/root/repo/SCALING.json"
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
