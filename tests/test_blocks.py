"""Parity of conv/deconv/BN blocks vs torch oracles (weight-transferred)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from dmvsnet_tpu.models import blocks


def test_conv_block_matches_torch(rng):
    x = rng.normal(size=(2, 9, 11, 4)).astype(np.float32)
    for k, s in [(3, 1), (5, 2), (3, 2)]:
        m = blocks.ConvBlock(6, kernel=k, stride=s, bn=False, relu=True)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(m.apply(variables, jnp.asarray(x)))

        tconv = tnn.Conv2d(4, 6, k, stride=s, padding=k // 2, bias=True)
        with torch.no_grad():
            kern = np.asarray(variables["params"]["conv"]["kernel"])  # (k,k,in,out)
            tconv.weight.copy_(torch.from_numpy(kern.transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["conv"]["bias"])))
            oracle = torch.relu(tconv(torch.from_numpy(x).permute(0, 3, 1, 2)))
        np.testing.assert_allclose(
            ours, oracle.permute(0, 2, 3, 1).numpy(), atol=1e-5,
            err_msg=f"k={k} s={s}",
        )


def test_deconv_block_matches_torch_convtranspose(rng):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) parity, odd and even inputs."""
    for h, w in [(6, 8), (7, 9)]:
        x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        m = blocks.DeconvBlock(5, kernel=3, dims=2, bn=False, relu=False)
        variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
        ours = np.asarray(m.apply(variables, jnp.asarray(x)))
        assert ours.shape == (1, 2 * h, 2 * w, 5)

        tconv = tnn.ConvTranspose2d(3, 5, 3, stride=2, padding=1, output_padding=1, bias=True)
        with torch.no_grad():
            kern = np.asarray(variables["params"]["conv"]["kernel"])  # transpose_kernel: (k,k,out,in)
            tconv.weight.copy_(torch.from_numpy(kern.transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["conv"]["bias"])))
            oracle = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            ours, oracle.permute(0, 2, 3, 1).numpy(), atol=1e-5, err_msg=f"h={h}"
        )


@pytest.mark.parametrize("d_", [2, 8])  # dilated 2d: ddense and dstack routes
def test_deconv3d_doubles_all_dims(rng, d_):
    x = rng.normal(size=(1, d_, 4, 6, 3)).astype(np.float32)
    m = blocks.DeconvBlock(4, kernel=3, dims=3, bn=False, relu=False)
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(x))
    out = m.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 2 * d_, 8, 12, 4)

    tconv = tnn.ConvTranspose3d(3, 4, 3, stride=2, padding=1, output_padding=1, bias=True)
    with torch.no_grad():
        kern = np.asarray(variables["params"]["conv"]["kernel"])  # (k,k,k,out,in)
        tconv.weight.copy_(torch.from_numpy(kern.transpose(4, 3, 0, 1, 2)))
        tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["conv"]["bias"])))
        oracle = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(out), oracle.permute(0, 2, 3, 4, 1).numpy(), atol=1e-5
    )


def test_batchnorm_train_and_momentum_match_torch(rng):
    x = rng.normal(size=(4, 5, 6, 3)).astype(np.float32) * 2 + 1
    m = blocks.ConvBlock(3, kernel=1, stride=1, bn=True, relu=False)
    variables = m.init(jax.random.PRNGKey(3), jnp.asarray(x))

    tconv = tnn.Conv2d(3, 3, 1, bias=False)
    tbn = tnn.BatchNorm2d(3, momentum=0.1)
    with torch.no_grad():
        kern = np.asarray(variables["params"]["conv"]["kernel"])
        tconv.weight.copy_(torch.from_numpy(kern.transpose(3, 2, 0, 1)))

    # one train-mode step: outputs use batch stats; running stats updated
    ours, state = m.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    tbn.train()
    oracle = tbn(tconv(torch.from_numpy(x).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), oracle.detach().permute(0, 2, 3, 1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5,
    )
    # torch's running var update uses the unbiased batch var (x n/(n-1)),
    # flax the biased one; both blend into an initial 1.0 with weight 0.1.
    n = x.size // 3
    flax_var = np.asarray(state["batch_stats"]["bn"]["var"])
    np.testing.assert_allclose(
        (flax_var - 0.9) * (n / (n - 1)) + 0.9, tbn.running_var.numpy(), atol=1e-5
    )

    # eval mode uses the running averages
    eval_vars = {"params": variables["params"], "batch_stats": state["batch_stats"]}
    ours_eval = m.apply(eval_vars, jnp.asarray(x), train=False)
    assert np.isfinite(np.asarray(ours_eval)).all()


def test_conv3d_dstack_matches_torch(rng):
    """The D-stacked conv3d path must equal torch Conv3d at stride 1 and 2,
    odd and even D."""
    for d_, stride in [(6, 1), (7, 1), (6, 2), (16, 1), (17, 2)]:
        x = rng.normal(size=(2, d_, 6, 10, 4)).astype(np.float32)
        m = blocks.ConvBlock(5, kernel=3, stride=stride, dims=3, bn=False, relu=False)
        variables = m.init(jax.random.PRNGKey(4), jnp.asarray(x))
        ours = np.asarray(m.apply(variables, jnp.asarray(x)))

        tconv = tnn.Conv3d(4, 5, 3, stride=stride, padding=1, bias=True)
        with torch.no_grad():
            kern = np.asarray(variables["params"]["conv"]["kernel"])  # (3,3,3,in,out)
            tconv.weight.copy_(torch.from_numpy(kern.transpose(4, 3, 0, 1, 2).copy()))
            tconv.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["conv"]["bias"])))
            oracle = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
        np.testing.assert_allclose(
            ours, oracle.permute(0, 2, 3, 4, 1).numpy(), atol=1e-5,
            err_msg=f"d={d_} stride={stride}",
        )
