"""DepthNet golden tests (torch oracle) + full-model smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from dmvsnet_tpu.models import depth_net, MVSNet
from tests.conftest import make_camera


def torch_depth_net_forward(cost_reg, depth_values, interval):
    """Independent oracle of the dual-depth head semantics
    (SURVEY.md §2.2 / reference networks/mvsnet.py:15-66).
    cost_reg: (B, 4, D, H, W); depth_values: (B, D, H, W)."""
    prob = F.softmax(cost_reg, dim=2)
    d4 = (prob * depth_values.unsqueeze(1)).sum(2)  # (B, 4, H, W)
    small, huge = d4[:, :2], d4[:, 2:]
    s_min, s_max = small.min(1)[0], small.max(1)[0]
    h_min, h_max = huge.min(1)[0], huge.max(1)[0]
    s_min_d, s_max_d = 2 * s_min - s_max, 2 * s_max - s_min
    h_min_d, h_max_d = 2 * h_min - h_max, 2 * h_max - h_min

    def stack6(mn, mx):
        return torch.stack(
            [3 * mn - 2 * mx, 2 * mn - mx, mn, mx, 2 * mx - mn, 3 * mx - 2 * mn], 1
        )

    ss, ssd = stack6(s_min, s_max), stack6(s_min_d, s_max_d)
    hs, hsd = stack6(h_min, h_max), stack6(h_min_d, h_max_d)

    h_, w_ = d4.shape[-2:]
    yy, xx = torch.meshgrid(torch.arange(h_), torch.arange(w_), indexing="ij")
    out = torch.zeros_like(d4)
    sel = [
        (0, 0, ss[:, :4]), (0, 1, ss[:, 2:]), (1, 0, hs[:, 2:]), (1, 1, hs[:, :4]),
        (2, 0, ssd[:, :4]), (2, 1, ssd[:, 2:]), (3, 0, hsd[:, 2:]), (3, 1, hsd[:, :4]),
    ]
    for ym, xm, stack in sel:
        m = ((yy % 4 == ym) & (xx % 2 == xm))[None, None]
        out = torch.where(m, stack, out)
    conf = 2 * (torch.sigmoid(interval / (d4.var(1, unbiased=False).sqrt() + 1e-5)) - 0.5)
    return d4, out, conf


def test_depth_net_forward_matches_oracle(rng):
    b, d, h, w = 2, 6, 8, 10
    cost = rng.normal(size=(b, d, h, w, 4)).astype(np.float32)
    dv = np.sort(rng.uniform(400, 900, size=(b, d, h, w)).astype(np.float32), axis=1)
    interval = np.float32(7.5)

    out = depth_net.forward(jnp.asarray(cost), jnp.asarray(dv), jnp.float32(interval))
    d4_o, dvc_o, conf_o = torch_depth_net_forward(
        torch.from_numpy(cost.transpose(0, 4, 1, 2, 3)), torch.from_numpy(dv),
        torch.tensor(interval),
    )
    np.testing.assert_allclose(
        np.asarray(out["depth_sub_plus"]).transpose(0, 3, 1, 2), d4_o.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out["depth_values_c"]), dvc_o.numpy(), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["photometric_confidence"]), conf_o.numpy(), atol=1e-4
    )


def test_depth_net_refine_matches_oracle(rng):
    b, h, w = 1, 6, 8
    cost = rng.normal(size=(b, 4, h, w, 4)).astype(np.float32)
    dv = np.sort(rng.uniform(400, 900, size=(b, 4, h, w)).astype(np.float32), axis=1)
    out = depth_net.refine(jnp.asarray(cost), jnp.asarray(dv), jnp.float32(3.0))

    prob = F.softmax(torch.from_numpy(cost.transpose(0, 4, 1, 2, 3)) * 5.0, dim=2)
    d4 = (prob * torch.from_numpy(dv).unsqueeze(1)).sum(2)
    s_min, s_max = d4[:, :2].min(1)[0], d4[:, :2].max(1)[0]
    h_min, h_max = d4[:, 2:].min(1)[0], d4[:, 2:].max(1)[0]
    yy, xx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    oracle = torch.zeros_like(s_min)
    for ym, xm, val in [(0, 0, s_min), (0, 1, s_max), (1, 0, h_max), (1, 1, h_min)]:
        oracle = torch.where(((yy % 2 == ym) & (xx % 2 == xm))[None], val, oracle)
    np.testing.assert_allclose(np.asarray(out["depth"]), oracle.numpy(), atol=1e-4)


def make_batch(rng, b=1, v=3, h=64, w=96, d0=32):
    imgs = rng.uniform(0, 1, size=(b, v, h, w, 3)).astype(np.float32)
    cams = np.stack(
        [make_camera(rng, fx=180.0, fy=180.0, cx=w / 8, cy=h / 8,
                     angle=0.04 * i, t=[0.2 * i, 0.0, 0.0]) for i in range(v)]
    )  # stage1 intrinsics (1/4 res)
    proj = {"stage1": np.broadcast_to(cams, (b, v, 2, 4, 4)).copy()}
    for s, f in [("stage2", 2.0), ("stage3", 4.0)]:
        p = proj["stage1"].copy()
        p[:, :, 1, :2, :] *= f
        proj[s] = p
    depth_values = np.linspace(425.0, 935.0, d0, dtype=np.float32)[None].repeat(b, 0)
    return imgs, proj, depth_values


@pytest.mark.parametrize("inverse", [False, True])
def test_mvsnet_forward_shapes_and_ranges(rng, inverse):
    imgs, proj, dv = make_batch(rng)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1), inverse_depth=inverse)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs),
        {k: jnp.asarray(p) for k, p in proj.items()}, jnp.asarray(dv),
    )
    out = model.apply(
        variables, jnp.asarray(imgs), {k: jnp.asarray(p) for k, p in proj.items()},
        jnp.asarray(dv),
    )
    b, _, h, w, _ = imgs.shape
    assert out["depth"].shape == (b, h, w)
    assert out["photometric_confidence"].shape == (b, h, w)
    assert out["stage1"]["depth"].shape == (b, h // 4, w // 4)
    assert out["stage2"]["depth"].shape == (b, h // 2, w // 2)
    for key in ["depth", "photometric_confidence", "depth_sub_plus",
                "depth_sub_plus_refine", "depth_values_c", "prob_volume"]:
        assert np.isfinite(np.asarray(out[key])).all(), key
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1).all()
    # untrained depths must still live near the global hypothesis range
    depth = np.asarray(out["depth"])
    assert depth.min() > 0 and depth.max() < 5000


def test_mvsnet_jit_and_grad(rng):
    imgs, proj, dv = make_batch(rng, h=32, w=32, d0=16)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1))
    proj_j = {k: jnp.asarray(p) for k, p in proj.items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs), proj_j, jnp.asarray(dv))

    @jax.jit
    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(imgs), proj_j, jnp.asarray(dv), train=True,
            mutable=["batch_stats"],
        )[0]
        return jnp.mean(jnp.abs(out["depth"] - 600.0)) + jnp.mean(
            jnp.abs(out["depth_sub_plus"] - 600.0)
        )

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient reaches the feature net (through warp values) and cost regs
    gnorm = sum(float(jnp.sum(l ** 2)) for l in leaves)
    assert gnorm > 0


def test_mvsnet_feature_bf16_close_to_fp32(rng):
    """feature_dtype=bfloat16 (the TPU eval default via build_model auto
    mode): params/tree structure identical to fp32, outputs fp32 at the
    interface, and depth stays close to the fp32 path.  The hardware gate
    is NUMERICS.json depth_feature_bf16_vs_default_mm."""
    imgs, proj, dv = make_batch(rng)
    proj_j = {k: jnp.asarray(p) for k, p in proj.items()}
    m32 = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1))
    m16 = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1),
                 feature_dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), jnp.asarray(imgs), proj_j, jnp.asarray(dv))
    v2 = m16.init(jax.random.PRNGKey(0), jnp.asarray(imgs), proj_j, jnp.asarray(dv))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out32 = m32.apply(v, jnp.asarray(imgs), proj_j, jnp.asarray(dv))
    out16 = m16.apply(v, jnp.asarray(imgs), proj_j, jnp.asarray(dv))
    assert out16["depth"].dtype == out32["depth"].dtype
    d32 = np.asarray(out32["depth"], np.float64)
    d16 = np.asarray(out16["depth"], np.float64)
    # depth unit = mm, hypothesis range 425-935: bf16 feature rounding
    # must stay a small fraction of the stage-3 interval even untrained
    assert np.abs(d16 - d32).mean() < 2.0
    assert np.isfinite(d16).all()


def test_mvsnet_adaptive_aggregation(rng):
    imgs, proj, dv = make_batch(rng, h=32, w=32, d0=16)
    model = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1), agg_mode="adaptive")
    proj_j = {k: jnp.asarray(p) for k, p in proj.items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs), proj_j, jnp.asarray(dv))
    # the gate nets exist and receive gradients
    assert any("agg_weight" in k for k in variables["params"])
    out = model.apply(variables, jnp.asarray(imgs), proj_j, jnp.asarray(dv))
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_remat_matches_non_remat_gradients():
    """nn.remat around the cost U-Nets must not change values or grads
    (it only changes WHEN activations are computed)."""
    import numpy as np

    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.utils import synthetic

    batch = synthetic.make_batch(batch=1, n_views=3, height=32, width=32,
                                 n_depths=16)
    imgs = jnp.asarray(batch["imgs"])
    proj = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])

    base = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1))
    rmt = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1), remat=True)
    v = base.init(jax.random.PRNGKey(0), imgs, proj, dv)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            imgs, proj, dv, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out["depth"])

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(rmt, p))(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # remat=True now also checkpoints the feature net: its recompute runs
    # under a different fusion context, so BN/conv reduction orders differ
    # at fp32 round-off (measured max abs 4e-5 on O(1e-3..1) grads) —
    # tolerance covers reassociation, still catches semantic drift
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        g0, g1,
    )
