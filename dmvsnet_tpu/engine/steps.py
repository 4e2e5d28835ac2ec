"""Jitted train / eval step factories.

One fused XLA program per step: forward (2 passes x 3 stages), loss,
backward, Adam update, metrics — the reference splits this across
separate CUDA launches + a DDP all-reduce (reference model.py:127-146);
under jit over a dp-sharded batch the gradient reduction is a single
XLA collective inserted by GSPMD.

The train step donates the state buffers so parameters are updated
in place in HBM.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dmvsnet_tpu.losses import metrics as metrics_lib
from dmvsnet_tpu.losses.mvs_loss import mvs_loss


def make_train_step(
    dlossw=(0.5, 1.0, 2.0), depth_mode: str = "regression",
    lr_schedule: Callable | None = None, jit: bool = True,
) -> Callable:
    """jit=False returns the raw step function (for callers that embed it
    in a larger jitted program, e.g. the amortized train benchmark)."""

    def train_step(state, batch):
        def loss_fn(params):
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["proj_matrices"], batch["depth_values"],
                train=True, mutable=["batch_stats"],
            )
            loss = mvs_loss(outputs, batch["depth"], batch["mask"], depth_mode, dlossw)
            return loss, (mutated["batch_stats"], outputs)

        (loss, (new_stats, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)

        final = f"stage{len(dlossw)}"
        gt = batch["depth"][final]
        mask = batch["mask"][final] > 0.5
        scalars = {"loss": loss, **metrics_lib.standard_metrics(outputs["depth"], gt, mask)}
        if lr_schedule is not None:
            scalars["lr"] = lr_schedule(state.step)
        # depth/confidence stay on device; the host only pays the copy when
        # the trainer actually renders imagery (summary_freq steps).
        return new_state, scalars, (outputs["depth"], outputs["photometric_confidence"])

    if jit:
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step


def make_eval_step(dlossw=(0.5, 1.0, 2.0), depth_mode: str = "regression") -> Callable:
    @jax.jit
    def eval_step(state, batch):
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"], batch["proj_matrices"], batch["depth_values"],
            train=False,
        )
        loss = mvs_loss(outputs, batch["depth"], batch["mask"], depth_mode, dlossw)
        final = f"stage{len(dlossw)}"
        gt = batch["depth"][final]
        mask = batch["mask"][final] > 0.5
        scalars = {"loss": loss, **metrics_lib.standard_metrics(outputs["depth"], gt, mask)}
        return scalars, outputs["depth"], outputs["photometric_confidence"]

    return eval_step


def make_infer_step() -> Callable:
    """Depth-map inference (the reference test path, model.py:332-336):
    returns (depth, confidence) for PFM export."""

    @jax.jit
    def infer_step(state, imgs, proj_matrices, depth_values):
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, proj_matrices, depth_values, train=False,
        )
        return outputs["depth"], outputs["photometric_confidence"]

    return infer_step
