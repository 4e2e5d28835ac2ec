"""Train state, optimizer and LR schedule.

Reproduces the reference recipe (reference model.py:41-43, tools.py:242-257):
Adam(lr, weight_decay=0) with a LambdaLR stepped at *fractional epochs*
``epoch + batch/len(loader)`` (reference model.py:138).  Here the schedule
is a pure function of the integer optimizer step given steps_per_epoch,
which reproduces the same piecewise curve.

steplr:   factor(e) = 1/3·(1-e/w) + e/w          for e < w  (warmup)
          factor(e) = decay^(#{milestones <= e})  otherwise
cosinelr: the reference's cosine-to-(decay^3·lr) variant.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    scheduler: str = "steplr",
    warmup_epochs: float = 0.2,
    milestones: Sequence[float] = (10, 12, 14),
    lr_decay: float = 0.5,
    total_epochs: int = 16,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    milestones = jnp.asarray(milestones, jnp.float32)

    def schedule(step):
        e = step.astype(jnp.float32) / steps_per_epoch
        warm = (1.0 / 3.0) * (1.0 - e / warmup_epochs) + e / warmup_epochs
        if scheduler == "steplr":
            factor = lr_decay ** jnp.sum(milestones <= e)
            after = base_lr * factor
        elif scheduler == "cosinelr":
            min_lr = base_lr * lr_decay ** 3
            t = (e - warmup_epochs) / (total_epochs - warmup_epochs)
            after = min_lr + 0.5 * (base_lr - min_lr) * (1.0 + jnp.cos(t * jnp.pi))
        else:
            raise ValueError(f"unknown scheduler {scheduler}")
        return jnp.where(e < warmup_epochs, base_lr * warm, after)

    return schedule


def make_optimizer(
    lr_schedule: Callable, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Adam matching torch defaults (betas (0.9, 0.999), eps 1e-8)."""
    if weight_decay:
        return optax.adamw(lr_schedule, weight_decay=weight_decay)
    return optax.adam(lr_schedule)


def create_train_state(
    model, rng, sample_batch, lr_schedule, weight_decay: float = 0.0
) -> TrainState:
    # Single-process: jit the init — eager flax init executes the whole
    # forward op-by-op (thousands of ~25 ms tunnel dispatches on the
    # remote-TPU harness); one jitted program compiles once and is
    # persistently cached.  Multi-process paths keep the eager init: the
    # model may carry a multi-host mesh whose sharding constraints can't
    # be satisfied by a process-local jit over unsharded sample arrays.
    init = model.init if jax.process_count() > 1 else jax.jit(model.init)
    variables = init(
        rng,
        sample_batch["imgs"],
        sample_batch["proj_matrices"],
        sample_batch["depth_values"],
    )
    tx = make_optimizer(lr_schedule, weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
