"""Multi-device (8 virtual CPU) sharding tests.

The reference has no multi-device test story at all (SURVEY.md §4);
these validate that the GSPMD-sharded train step is numerically the
same program as the single-device one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmvsnet_tpu.engine import create_train_state, make_lr_schedule, make_train_step
from dmvsnet_tpu.models import MVSNet
from dmvsnet_tpu.parallel import make_mesh, shard_batch
from dmvsnet_tpu.utils import synthetic

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

BATCH = 8  # divisible by every dp size tested


def _setup(mesh, batch_size=BATCH, seed=0):
    batch = synthetic.make_batch(
        batch=batch_size, n_views=3, height=32, width=32, n_depths=16
    )
    # de-duplicate the batch so dp shards see different data
    rng = np.random.default_rng(seed)
    batch["imgs"] += rng.normal(0, 0.01, batch["imgs"].shape).astype(np.float32)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1), mesh=mesh)
    lr = make_lr_schedule(1e-3, steps_per_epoch=100)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, lr)
    return batch, state


@pytest.fixture(scope="module")
def reference_step():
    """Single-device (replicated) train step result, shared by all tests."""
    batch, state = _setup(None)
    step = make_train_step()
    state, scalars, _ = step(state, batch)
    return float(scalars["loss"]), state.params


@pytest.mark.parametrize("n_data,n_spatial", [(4, 2), (2, 4)])
def test_sharded_step_matches_single_device(reference_step, n_data, n_spatial):
    ref_loss, ref_params = reference_step
    mesh = make_mesh(n_data=n_data, n_spatial=n_spatial)
    batch, state = _setup(mesh)
    step = make_train_step()
    state, scalars, _ = step(state, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(scalars["loss"]), ref_loss, rtol=2e-4)
    # parameters after one update agree (grad all-reduce == serial sum).
    # Tolerance: Adam's first update is ~±lr regardless of gradient
    # magnitude, so fp reduction-order noise on a near-zero gradient can
    # flip one element by up to 2*lr_warmup — not a sharding divergence.
    ps = jax.tree_util.tree_leaves(state.params)
    pr = jax.tree_util.tree_leaves(ref_params)
    for a, b in zip(ps, pr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_graft_entry_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_view_sharded_aggregation_matches_serial():
    """vp-sharded psum of per-view correlations == serial sum (XLA and
    Pallas-interpret paths), and the vp-sharded TRAIN STEP matches the
    single-device program end-to-end."""
    from dmvsnet_tpu.ops import warp as warp_ops

    batch = synthetic.make_batch(batch=2, n_views=5, height=32, width=32,
                                 n_depths=8)
    feats = [jnp.asarray(
        np.random.default_rng(i).normal(size=(2, 32, 32, 8)).astype(np.float32))
        for i in range(5)]
    proj2 = jnp.asarray(batch["proj_matrices"]["stage3"])
    dv = jnp.asarray(batch["depth_values"])

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv)
    mesh = make_mesh(n_data=2, n_view=4, n_spatial=1)
    assert mesh.shape["vp"] == 4
    got = warp_ops.aggregate_cost_volume_view_sharded(feats, proj2, dv, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    got_p = warp_ops.aggregate_cost_volume_view_sharded(
        feats, proj2, dv, mesh, use_pallas=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_view_sharded_train_step_matches_single_device(reference_step):
    ref_loss, ref_params = reference_step
    mesh = make_mesh(n_data=4, n_view=2, n_spatial=1)
    batch, state = _setup(mesh)  # V=3 -> 2 source views over vp=2
    step = make_train_step()
    state, scalars, _ = step(state, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(scalars["loss"]), ref_loss, rtol=2e-4)
    ps = jax.tree_util.tree_leaves(state.params)
    pr = jax.tree_util.tree_leaves(ref_params)
    for a, b in zip(ps, pr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
