"""Worker for the 2-process jax.distributed test (see test_multiprocess.py).

Runs as ``python multiprocess_worker.py <rank> <nproc> <port> <outdir>``
with XLA_FLAGS=--xla_force_host_platform_device_count=4 in the env.
Exercises the true multi-host path end to end on CPU:

* global-batch assembly from process-local loader shards
  (parallel.mesh.shard_batch -> jax.make_array_from_process_local_data);
* a real sharded train step over a multi-process (dp) mesh, proving the
  GSPMD gradient/BN reductions span processes;
* collective orbax checkpoint save + restore (engine.checkpoint).

Writes {outdir}/rank{rank}.json with scalars for the parent to compare.
"""

from __future__ import annotations

import json
import os
import sys


def main():
    rank, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=rank,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from dmvsnet_tpu.data.loader import Loader
    from dmvsnet_tpu.engine import checkpoint as ckpt_lib
    from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
    from dmvsnet_tpu.engine.steps import make_train_step
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.parallel import make_mesh, shard_batch
    from dmvsnet_tpu.parallel.mesh import replicate_tree
    from dmvsnet_tpu.utils import synthetic

    result: dict = {"rank": rank}

    # --- 1. loader sharding + global-batch assembly ---------------------
    mesh = make_mesh(n_data=4 * nproc, n_spatial=1)
    data = [{"x": np.full((3,), float(i), np.float32)} for i in range(16)]

    class ListDS:
        def __len__(self):
            return len(data)

        def __getitem__(self, i):
            return data[i]

    loader = Loader(ListDS(), batch_size=4, shuffle=True, seed=7,
                    num_hosts=nproc, host_id=rank)
    loader.set_epoch(3)
    local = next(iter(loader))
    batch = shard_batch(local, mesh)
    assert batch["x"].shape == (8, 3), batch["x"].shape  # GLOBAL batch

    total = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
    result["batch_sum"] = float(total)

    # --- 2. sharded train step over the multi-process mesh --------------
    GB = 8  # global batch; each host renders the full deterministic batch
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1),
                   inverse_depth=True, mesh=mesh)
    full = synthetic.make_batch(batch=GB, n_views=3, height=32, width=64,
                                n_depths=16)
    # simulate per-process loader output: this host's contiguous shard
    lo, hi = rank * (GB // nproc), (rank + 1) * (GB // nproc)
    local_batch = jax.tree_util.tree_map(
        lambda x: x[lo:hi] if hasattr(x, "shape") and x.shape[:1] == (GB,) else x,
        full,
    )
    lr = make_lr_schedule(1e-3, steps_per_epoch=10)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jax.tree_util.tree_map(jnp.asarray, local_batch), lr,
    )
    state = replicate_tree(state, mesh)
    train_step = make_train_step(lr_schedule=lr)
    sharded = shard_batch(local_batch, mesh)
    state, scalars, _ = train_step(state, sharded)
    result["loss"] = float(scalars["loss"])
    result["thres2mm"] = float(scalars["thres2mm_error"])

    # --- 3. collective orbax save + restore -----------------------------
    ckpt_dir = os.path.join(outdir, "ckpt")
    path = ckpt_lib.save_checkpoint(ckpt_dir, 0, state)
    state2 = create_train_state(
        model, jax.random.PRNGKey(1),
        jax.tree_util.tree_map(jnp.asarray, local_batch), lr,
    )
    state2 = replicate_tree(state2, mesh)
    state2, epoch = ckpt_lib.restore_checkpoint(path, state2)
    from jax.experimental import multihost_utils

    state2 = replicate_tree(state2, mesh)
    leaves = jax.tree_util.tree_leaves(state2.params)
    checksum = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    ref = float(sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(state.params)
    ))
    result["ckpt_checksum"] = checksum
    result["ckpt_checksum_ref"] = ref
    result["resume_epoch"] = epoch

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump(result, f)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
