"""Engine tests: LR schedule golden, train-step learning, eval step."""

import numpy as np
import jax
import jax.numpy as jnp

from dmvsnet_tpu.engine import create_train_state, make_lr_schedule, make_train_step, make_eval_step
from dmvsnet_tpu.models import MVSNet
from dmvsnet_tpu.utils import synthetic


def reference_lambda(e, warmup=0.2, milestones=(10, 12, 14), decay=0.5):
    """The reference LambdaLR factor (reference tools.py:247-248)."""
    if e < warmup:
        return 1 / 3 * (1 - e / warmup) + e / warmup
    return decay ** sum(m <= e for m in milestones)


def test_lr_schedule_matches_reference_lambda():
    spe = 50
    sched = make_lr_schedule(1e-3, steps_per_epoch=spe)
    for step in [0, 5, 9, 10, 25, 499, 500, 520, 600, 700, 750]:
        e = step / spe
        np.testing.assert_allclose(
            float(sched(jnp.asarray(step))), 1e-3 * reference_lambda(e),
            rtol=1e-6, err_msg=f"step {step}",
        )


def _tiny_setup(seed=0):
    batch = synthetic.make_batch(batch=1, n_views=3, height=32, width=32, n_depths=16)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1))
    lr = make_lr_schedule(1e-3, steps_per_epoch=100, milestones=(10, 12, 14))
    state = create_train_state(model, jax.random.PRNGKey(seed), batch, lr)
    return model, batch, state, lr


def test_train_step_reduces_loss_on_one_batch():
    _, batch, state, lr = _tiny_setup()
    step = make_train_step(lr_schedule=lr)
    losses = []
    for _ in range(8):
        state, scalars, _ = step(state, batch)
        losses.append(float(scalars["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8


def test_eval_step_outputs():
    _, batch, state, _ = _tiny_setup()
    eval_step = make_eval_step()
    scalars, depth, conf = eval_step(state, batch)
    assert depth.shape == (1, 32, 32) and conf.shape == (1, 32, 32)
    assert np.isfinite(float(scalars["loss"]))
    for k in ["abs_depth_error", "thres2mm_error", "thres4mm_error", "thres8mm_error"]:
        assert 0 <= float(scalars[k]) < 1e6
