"""Folded (space-to-depth) conv execution == canonical blocks, same params.

The folded path (models/folded.py) is a pure relayout of the same
arithmetic; every test initializes the CANONICAL block and applies both
executions with identical variables.  Tolerances are fp32 reduction-order
noise only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvsnet_tpu.models import blocks, folded


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def test_fold_unfold_roundtrip():
    x3 = _rand((2, 6, 8, 12, 3))
    assert jnp.array_equal(folded.unfold3d(folded.fold3d(x3), 6, 3), x3)
    x2 = _rand((2, 8, 12, 5))
    assert jnp.array_equal(folded.unfold2d(folded.fold2d(x2), 5), x2)


@pytest.mark.parametrize("d,ci,co", [(8, 2, 8), (4, 2, 8)])
def test_folded_conv3d_stride1_matches_convblock(d, ci, co):
    x = _rand((1, d, 16, 24, ci))
    std = blocks.ConvBlock(co, kernel=3, stride=1, dims=3, bn=False, relu=False)
    v = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(v, x)

    fb = folded.FoldedConvBlock(co, d=d, kernel=3, stride=1, dims=3,
                                bn=False, relu=False)
    got = folded.unfold3d(fb.apply(v, folded.fold3d(x)), d, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_conv3d_stride2_matches_convblock():
    d, ci, co = 8, 8, 16
    x = _rand((1, d, 16, 24, ci))
    std = blocks.ConvBlock(co, kernel=3, stride=2, dims=3, bn=False, relu=False)
    v = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(v, x)

    fb = folded.FoldedConvBlock(co, d=d, kernel=3, stride=2, dims=3,
                                bn=False, relu=False)
    got = fb.apply(v, folded.fold3d(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,stride", [(3, 1), (3, 2), (5, 2), (1, 1)])
def test_folded_conv2d_matches_convblock(kernel, stride):
    ci, co = 8, 16
    x = _rand((2, 16, 24, ci))
    std = blocks.ConvBlock(co, kernel=kernel, stride=stride, dims=2,
                           bn=False, relu=False)
    v = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(v, x)

    fb = folded.FoldedConvBlock(co, d=1, kernel=kernel, stride=stride, dims=2,
                                bn=False, relu=False)
    got = fb.apply(v, folded.fold2d(x))
    if stride == 1:
        got = folded.unfold2d(got, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_deconv3d_matches_deconvblock():
    d, ci, co = 4, 16, 8
    x = _rand((1, d, 8, 12, ci))
    std = blocks.DeconvBlock(co, kernel=3, dims=3, bn=False, relu=False)
    v = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(v, x)  # (1, 2d, 16, 24, co)

    fb = folded.FoldedDeconvBlock(co, d_in=d, dims=3, bn=False, relu=False)
    got = folded.unfold3d(fb.apply(v, x), 2 * d, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_plainconv_bias_matches():
    ci, co = 8, 32
    x = _rand((2, 16, 24, ci))
    std = blocks.PlainConv(co, kernel=1, dims=2, use_bias=True)
    v = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(v, x)
    fp = folded.FoldedPlainConv(co, d=1, kernel=1, dims=2, use_bias=True)
    got = folded.unfold2d(fp.apply(v, folded.fold2d(x)), co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_folded_batchnorm_train_and_eval_match():
    d, c = 4, 8
    x = _rand((2, d, 8, 12, c))
    std = blocks.ConvBlock(c, kernel=3, stride=1, dims=3, bn=True, relu=True)
    v = std.init(jax.random.PRNGKey(0), x)
    fb = folded.FoldedConvBlock(c, d=d, kernel=3, stride=1, dims=3,
                                bn=True, relu=True)

    # train mode: outputs AND updated running stats must agree
    want, wmut = std.apply(v, x, train=True, mutable=["batch_stats"])
    got, gmut = fb.apply(v, folded.fold3d(x), train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(folded.unfold3d(got, d, c)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        wmut["batch_stats"], gmut["batch_stats"],
    )

    # eval mode with running stats
    want = std.apply(v, x, train=False)
    got = fb.apply(v, folded.fold3d(x), train=False)
    np.testing.assert_allclose(np.asarray(folded.unfold3d(got, d, c)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_folded_conv_gradients_match():
    d, ci, co = 4, 2, 8
    x = _rand((1, d, 8, 12, ci))
    std = blocks.ConvBlock(co, kernel=3, stride=1, dims=3, bn=False, relu=False)
    v = std.init(jax.random.PRNGKey(0), x)
    fb = folded.FoldedConvBlock(co, d=d, kernel=3, stride=1, dims=3,
                                bn=False, relu=False)

    def loss_std(params, x):
        return jnp.sum(jnp.sin(std.apply({"params": params}, x)))

    def loss_fold(params, x):
        return jnp.sum(jnp.sin(folded.unfold3d(
            fb.apply({"params": params}, folded.fold3d(x)), d, co)))

    g1 = jax.grad(loss_std)(v["params"], x)
    g2 = jax.grad(loss_fold)(v["params"], x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g1, g2,
    )


# ---------------------------------------------------------------------------
# integration: whole branches / nets, folded vs standard, same params
# ---------------------------------------------------------------------------

def test_costregnet_part_folded_matches_standard():
    from dmvsnet_tpu.models.cost_reg import CostRegNetPart

    x = _rand((1, 8, 32, 48, 2))
    std = CostRegNetPart(8, fold_level0=False)
    fld = CostRegNetPart(8, fold_level0=True)
    v = std.init(jax.random.PRNGKey(0), x)
    v2 = fld.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), v, v2)

    for train in (False, True):
        kw = {"mutable": ["batch_stats"]} if train else {}
        want = std.apply(v, x, train=train, **kw)
        got = fld.apply(v, x, train=train, **kw)
        if train:
            (want, wmut), (got, gmut) = want, got
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
                wmut["batch_stats"], gmut["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_costregnet_refine_part_folded_matches_standard():
    from dmvsnet_tpu.models.cost_reg import CostRegNetPartRefine

    x = _rand((1, 4, 32, 48, 2))
    std = CostRegNetPartRefine(8, fold_level0=False)
    fld = CostRegNetPartRefine(8, fold_level0=True)
    v = std.init(jax.random.PRNGKey(0), x)
    v2 = fld.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    want = std.apply(v, x)
    got = fld.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_feature_net_folded_matches_standard():
    from dmvsnet_tpu.models.feature_net import FeatureNet

    x = _rand((2, 64, 96, 3))
    std = FeatureNet(8, fold_level0=False)
    fld = FeatureNet(8, fold_level0=True)
    v = std.init(jax.random.PRNGKey(0), x)
    v2 = fld.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    want = std.apply(v, x)
    got = fld.apply(v, x)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_folded_bf16_dtype_matches_standard_bf16():
    """compute_dtype=bfloat16: the folded execution must agree with the
    standard path at bf16 tolerances (same cast points)."""
    from dmvsnet_tpu.models.cost_reg import CostRegNetPart

    x = _rand((1, 8, 32, 48, 2))
    std = CostRegNetPart(8, dtype=jnp.bfloat16, fold_level0=False)
    fld = CostRegNetPart(8, dtype=jnp.bfloat16, fold_level0=True)
    v = std.init(jax.random.PRNGKey(0), x)
    want = np.asarray(std.apply(v, x), np.float32)
    got = np.asarray(fld.apply(v, x), np.float32)
    scale = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / scale < 0.05
