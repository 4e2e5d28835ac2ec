"""Checkpoint save/restore (orbax).

Replaces torch.save/load of {epoch, model, optimizer, lr_scheduler}
(reference model.py:93-99, :59-70) with orbax checkpoints of the whole
TrainState pytree.  Two restore modes mirror the reference:

* full resume (training): params + batch_stats + opt_state + step;
* weights-only (val / test / finetune): params + batch_stats only.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(log_dir: str, step: int | str) -> str:
    return os.path.join(os.path.abspath(log_dir), f"model_{step:06d}" if isinstance(step, int) else str(step))


def save_checkpoint(log_dir: str, epoch: int, state) -> str:
    """Full-state save, one directory per epoch.

    Called by EVERY process: orbax saves are collective over sharded /
    replicated global arrays (each process writes its addressable
    shards), unlike the reference's rank-0 torch.save of a replicated
    module (reference model.py:93-99).  Single-process this is a plain
    local save.
    """
    path = _path(log_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "epoch": np.asarray(epoch),
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state, weights_only: bool = False):
    """Restore into an existing state skeleton; returns (state, epoch).

    weights_only matches the reference's val/test/finetune behavior
    (reference model.py:61-70): optimizer/epoch are NOT restored.
    """
    ckptr = ocp.StandardCheckpointer()
    skeleton = {
        "epoch": np.asarray(0),
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    payload = ckptr.restore(os.path.abspath(path), skeleton)
    state = state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )
    if weights_only:
        return state, 0
    state = state.replace(
        step=jax.numpy.asarray(payload["step"]), opt_state=payload["opt_state"]
    )
    return state, int(payload["epoch"]) + 1


def save_weights(path: str, params, batch_stats) -> None:
    """Weights-only checkpoint (e.g. converted from a torch .ckpt)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": params, "batch_stats": batch_stats},
               force=True)
    ckptr.wait_until_finished()


def restore_weights(path: str, state):
    """Restore a weights-only checkpoint written by save_weights."""
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(
        os.path.abspath(path),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    return state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )


def latest_checkpoint(log_dir: str) -> str | None:
    if not os.path.isdir(log_dir):
        return None
    cands = sorted(
        d for d in os.listdir(log_dir)
        if d.startswith("model_") and os.path.isdir(os.path.join(log_dir, d))
    )
    return os.path.join(log_dir, cands[-1]) if cands else None
