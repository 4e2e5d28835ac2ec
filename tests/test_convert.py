"""Torch-checkpoint converter test: synthesize a reference-named
state_dict from our own param tree via the inverse mapping, convert it,
and require an exact round trip (same tree, same values)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo/tools")
from convert_torch_ckpt import convert_state_dict, _DECONV_NAMES  # noqa: E402

from dmvsnet_tpu.models import MVSNet  # noqa: E402
from dmvsnet_tpu.utils import synthetic  # noqa: E402


_FEATURE_INV = {
    "conv0_0": "conv0.0", "conv0_1": "conv0.1",
    "conv1_0": "conv1.0", "conv1_1": "conv1.1", "conv1_2": "conv1.2",
    "conv2_0": "conv2.0", "conv2_1": "conv2.1", "conv2_2": "conv2.2",
}


def _inverse_kernel(k: np.ndarray, is_deconv: bool) -> np.ndarray:
    # flax conv (kh..,I,O) -> torch (O,I,kh..); flax deconv-with-
    # transpose_kernel stores (kh..,O,I) -> torch ConvT (I,O,kh..):
    # both directions are the same axis permutation.
    if k.ndim == 4:
        return k.transpose(3, 2, 0, 1)
    return k.transpose(4, 3, 0, 1, 2)


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def _to_torch_names(params, batch_stats):
    """Our flax tree -> reference torch state_dict names + layouts."""
    sd = {}
    for path, val in list(_flatten(params)) + list(_flatten(batch_stats)):
        top = path[0]
        if top == "feature":
            block = path[1]
            tname = "feature." + _FEATURE_INV.get(block, block)
        elif top.startswith("cost_reg_refine_"):
            tname = f"cost_regularization_refine.{top.split('_')[-1]}.{path[1]}.{path[2]}"
        elif top.startswith("cost_reg_"):
            tname = f"cost_regularization.{top.split('_')[-1]}.{path[1]}.{path[2]}"
        else:
            raise KeyError(top)

        module = path[-3] if len(path) >= 3 else path[1]
        kind, leaf = path[-2], path[-1]
        if kind == "conv":
            if top == "feature" and path[1] in ("out1", "out2", "out3", "inner1", "inner2"):
                # plain head convs have no ".conv" in torch names
                pass
            elif module == "prob" or path[-3] == "prob":
                pass  # raw nn.Conv3d
            else:
                tname += ".conv"
            if leaf == "kernel":
                sd[tname + ".weight"] = _inverse_kernel(val, path[-3] in _DECONV_NAMES)
            else:
                sd[tname + ".bias"] = val
        elif kind == "bn":
            tname += ".bn"
            key = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                   "var": "running_var"}[leaf]
            sd[tname + f".{key}"] = val
        else:
            raise KeyError(f"{path}")
    return sd


def test_convert_round_trip_full_model(rng):
    batch = synthetic.make_batch(batch=1, n_views=2, height=32, width=32, n_depths=8)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["imgs"]),
        {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()},
        jnp.asarray(batch["depth_values"]),
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = _to_torch_names(params, stats)
    sd["some.attn_mask"] = np.zeros(3)  # must be dropped like the reference does
    sd["feature.conv0.0.bn.num_batches_tracked"] = np.asarray(7)
    p2, s2 = convert_state_dict(sd)

    flat_a = dict(_flatten(params))
    flat_b = dict(_flatten(p2))
    assert set(flat_a) == set(flat_b), (
        set(flat_a) ^ set(flat_b)
    )
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=str(k))
    flat_a = dict(_flatten(stats))
    flat_b = dict(_flatten(s2))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=str(k))

    # converted tree must be accepted by model.apply (structure check)
    out = model.apply(
        {"params": p2, "batch_stats": s2}, jnp.asarray(batch["imgs"]),
        {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()},
        jnp.asarray(batch["depth_values"]),
    )
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_export_state_dict_matches_reference_names_and_round_trips(rng):
    """tools.convert_torch_ckpt.export_state_dict (flax -> torch) produces
    exactly the reference's state_dict names/layouts (cross-checked against
    this file's independent inverse mapping) and round-trips bitwise
    through convert_state_dict."""
    from convert_torch_ckpt import convert_state_dict, export_state_dict

    batch = synthetic.make_batch(batch=1, n_views=2, height=32, width=32, n_depths=8)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["imgs"]),
        {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()},
        jnp.asarray(batch["depth_values"]),
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = export_state_dict(params, stats)
    want = _to_torch_names(params, stats)
    assert set(sd) == set(want), set(sd) ^ set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k], err_msg=k)

    p2, s2 = convert_state_dict(sd)
    for (ka, va), (kb, vb) in zip(sorted(_flatten(params)), sorted(_flatten(p2))):
        assert ka == kb
        np.testing.assert_array_equal(va, vb, err_msg=str(ka))
    for (ka, va), (kb, vb) in zip(sorted(_flatten(stats)), sorted(_flatten(s2))):
        assert ka == kb
        np.testing.assert_array_equal(va, vb, err_msg=str(ka))
