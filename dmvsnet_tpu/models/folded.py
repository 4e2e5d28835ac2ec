"""Folded (space-to-depth) execution of narrow-channel full-res convs.

The reference's cost U-Nets and feature pyramid run 3x3(x3) convs with
8-64 output channels at full image resolution (reference
networks/module.py:274-340, :342-436).  On the v5e those shapes leave
most MXU lanes idle: the contraction is fine (K = 9*Cin) but N = Cout is
a fraction of a 128-lane tile, and the measured rate collapses to
1.5-3.2 TF/s (STAGETIME.json r2) against 13-21 TF/s for the same U-Net
at wide-channel stages.

The fix is a pure RELAYOUT: fold a 2x2 spatial block (and, for cost
volumes, the whole depth-plane axis — the conv3d_ddense trick,
models/blocks.py:45) into channels and run ONE dense conv2d whose kernel
is assembled from the canonical 3x3(x3) parameters with the appropriate
band structure.  Channel counts multiply by 4 (x D), pushing N into MXU
territory; the arithmetic is EXACT (same reduction, reordered), so torch
parity and checkpoints are unaffected — parameters keep their canonical
shapes and names, only the execution plan changes.

Folded layouts (phase = position inside the 2x2 spatial block):
  2D: (N, H, W, C)    -> (N, H/2, W/2, 4C)    channel = (pi, pj, c)
  3D: (B, D, H, W, C) -> (B, H/2, W/2, D*4*C) channel = (d, pi, pj, c)

Tap algebra (y-dim; x identical; D uses the plain ddense band):
  stride-1, folded out: out row 2Y'+p' reads in row 2(Y'+u)+p at tap
      kt = 2u + p - p' + k//2           (u spans ceil(-(k//2+1)/2)..)
  stride-2, plain out:  out row O=Y' reads in row 2(Y'+u)+p at tap
      kt = 2u + p + k//2
  deconv k3 s2 (torch ConvTranspose, out = 2*in): out row 2Y'+p' sums
      in[Y'+u] * K[p' - 2u + 1], u in {0, 1}
with the flax/converted kernel convention K[kt, ..., co, ci] = torch
W[ci, co, kt] (tools/convert_torch_ckpt.py:48-53).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dmvsnet_tpu.models.blocks import (
    torch_conv_bias_init,
    torch_conv_kernel_init,
)

Dtype = Any


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------

def fold2d(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel = (pi, pj, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def unfold2d(x: jnp.ndarray, c: int) -> jnp.ndarray:
    n, h2, w2, _ = x.shape
    x = x.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h2 * 2, w2 * 2, c)


def fold3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, H/2, W/2, D*4*C), channel = (d, pi, pj, c)."""
    b, d, h, w, c = x.shape
    x = x.transpose(0, 2, 3, 1, 4).reshape(b, h // 2, 2, w // 2, 2, d, c)
    return x.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, h // 2, w // 2, d * 4 * c)


def unfold3d(x: jnp.ndarray, d: int, c: int) -> jnp.ndarray:
    b, h2, w2, _ = x.shape
    x = x.reshape(b, h2, w2, d, 2, 2, c).transpose(0, 3, 1, 4, 2, 5, 6)
    return x.reshape(b, d, h2 * 2, w2 * 2, c)


def fold_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, H, W, D*C) (the plain ddense fold)."""
    b, d, h, w, c = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)


# ---------------------------------------------------------------------------
# folded-kernel builders (index arrays are compile-time numpy constants;
# the only traced op is one gather + mask on the canonical parameter)
# ---------------------------------------------------------------------------

def _gather_kernel(kern, kd_i, ky_i, kx_i, ci_i, co_i, valid, dims):
    if dims == 3:
        out = kern[
            np.clip(kd_i, 0, kern.shape[0] - 1),
            np.clip(ky_i, 0, kern.shape[1] - 1),
            np.clip(kx_i, 0, kern.shape[2] - 1),
            ci_i, co_i,
        ]
    else:
        out = kern[
            np.clip(ky_i, 0, kern.shape[0] - 1),
            np.clip(kx_i, 0, kern.shape[1] - 1),
            ci_i, co_i,
        ]
    return jnp.where(jnp.asarray(valid), out, 0.0)


def folded_kernel_s1(kern: jnp.ndarray, d: int, dims: int) -> tuple[jnp.ndarray, list]:
    """Canonical (k,..,k,ci,co) stride-1 kernel -> folded-in/folded-out
    conv2d kernel (ku, kv, d*4*ci, d*4*co) + XLA padding."""
    k = kern.shape[0] if dims == 3 else kern.shape[0]
    ci, co = kern.shape[-2], kern.shape[-1]
    # u range where kt = 2u + p - p' + k//2 can land in [0, k)
    us = [u for u in range(-k, k + 1)
          if any(0 <= 2 * u + p - pp + k // 2 < k
                 for p in (0, 1) for pp in (0, 1))]
    u0, u1 = min(us), max(us)
    ku = u1 - u0 + 1

    cin_f, cout_f = d * 4 * ci, d * 4 * co
    U, V, A, B = np.meshgrid(
        np.arange(ku), np.arange(ku), np.arange(cin_f), np.arange(cout_f),
        indexing="ij",
    )
    dd, rest = A // (4 * ci), A % (4 * ci)
    pi, pj, ci_i = rest // (2 * ci), (rest // ci) % 2, rest % ci
    ddo, rest = B // (4 * co), B % (4 * co)
    po, qo, co_i = rest // (2 * co), (rest // co) % 2, rest % co
    kty = 2 * (U + u0) + pi - po + k // 2
    ktx = 2 * (V + u0) + pj - qo + k // 2
    ktd = dd - ddo + 1 if dims == 3 else np.zeros_like(kty)
    valid = (kty >= 0) & (kty < k) & (ktx >= 0) & (ktx < k)
    if dims == 3:
        valid &= (ktd >= 0) & (ktd < kern.shape[0])
    kf = _gather_kernel(kern, ktd, kty, ktx, ci_i, co_i, valid, dims)
    return kf, [(-u0, u1), (-u0, u1)]


def folded_kernel_s2(kern: jnp.ndarray, d: int, dims: int) -> tuple[jnp.ndarray, list, int]:
    """Stride-2 kernel -> folded-in / PLAIN-out conv2d kernel
    (ku, kv, d*4*ci, do*co) + padding + do."""
    k = kern.shape[0]
    ci, co = kern.shape[-2], kern.shape[-1]
    do = (d + 1) // 2 if dims == 3 else 1
    us = [u for u in range(-k, k + 1)
          if any(0 <= 2 * u + p + k // 2 < k for p in (0, 1))]
    u0, u1 = min(us), max(us)
    ku = u1 - u0 + 1

    cin_f, cout_f = d * 4 * ci, do * co
    U, V, A, B = np.meshgrid(
        np.arange(ku), np.arange(ku), np.arange(cin_f), np.arange(cout_f),
        indexing="ij",
    )
    dd, rest = A // (4 * ci), A % (4 * ci)
    pi, pj, ci_i = rest // (2 * ci), (rest // ci) % 2, rest % ci
    ddo, co_i = B // co, B % co
    kty = 2 * (U + u0) + pi + k // 2
    ktx = 2 * (V + u0) + pj + k // 2
    ktd = dd - 2 * ddo + 1 if dims == 3 else np.zeros_like(kty)
    valid = (kty >= 0) & (kty < k) & (ktx >= 0) & (ktx < k)
    if dims == 3:
        valid &= (ktd >= 0) & (ktd < kern.shape[0])
    kf = _gather_kernel(kern, ktd, kty, ktx, ci_i, co_i, valid, dims)
    return kf, [(-u0, u1), (-u0, u1)], do


def folded_kernel_deconv(kern: jnp.ndarray, d_in: int, dims: int) -> tuple[jnp.ndarray, list, int]:
    """ConvTranspose(k=3, s=2, p=1, op=1) kernel in flax transpose layout
    (3,..,3, co, ci) -> plain-D-folded-in / folded-out conv2d kernel
    (2, 2, d_in*ci, d_out*4*co) + padding + d_out.

    Derivation: out[2Y'+p'] = sum_u in[Y'+u] * K[p' - 2u + 1] (u in 0..1);
    the depth axis uses the same band with od = 2*md + ktd - 1.
    """
    co, ci = kern.shape[-2], kern.shape[-1]
    d_out = 2 * d_in if dims == 3 else 1
    cin_f, cout_f = d_in * ci, d_out * 4 * co
    U, V, A, B = np.meshgrid(
        np.arange(2), np.arange(2), np.arange(cin_f), np.arange(cout_f),
        indexing="ij",
    )
    md, ci_i = A // ci, A % ci
    od, rest = B // (4 * co), B % (4 * co)
    po, qo, co_i = rest // (2 * co), (rest // co) % 2, rest % co
    kty = po - 2 * U + 1
    ktx = qo - 2 * V + 1
    ktd = od - 2 * md + 1 if dims == 3 else np.zeros_like(kty)
    valid = (kty >= 0) & (kty < 3) & (ktx >= 0) & (ktx < 3)
    if dims == 3:
        valid &= (ktd >= 0) & (ktd < 3)
    # kernel layout is (taps..., co, ci): swap the channel index order
    if dims == 3:
        out = kern[np.clip(ktd, 0, 2), np.clip(kty, 0, 2),
                   np.clip(ktx, 0, 2), co_i, ci_i]
    else:
        out = kern[np.clip(kty, 0, 2), np.clip(ktx, 0, 2), co_i, ci_i]
    kf = jnp.where(jnp.asarray(valid), out, 0.0)
    return kf, [(0, 1), (0, 1)], d_out


def _conv2d(x, kern, padding):
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# folded batch norm: canonical per-C statistics over folded layouts
# ---------------------------------------------------------------------------

class FoldedBatchNorm(nn.Module):
    """BatchNorm over a folded (..., G*C) tensor with CANONICAL per-C
    statistics (reduce over batch, space, AND the G fold groups) — exactly
    the reduction set of nn.BatchNorm on the unfolded (B, D, H, W, C)
    tensor, so train/eval numerics match the standard path bit-for-bit
    up to reduction order.  Param/stat names and shapes match
    nn.BatchNorm so state dicts are interchangeable."""

    channels: int
    groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        c, g = self.channels, self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            # constant affine of the running stats: fold scale/shift in
            # fp32, apply in the INPUT dtype — bf16 nets keep their conv
            # -> scale-shift -> relu traffic bf16 (see blocks.ConvBlock)
            inv = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            shift = bias - ra_mean.value * inv
            inv_f = jnp.tile(inv, g).astype(x.dtype)
            shift_f = jnp.tile(shift, g).astype(x.dtype)
            return x * inv_f + shift_f
        xr = x.astype(jnp.float32).reshape(*x.shape[:-1], g, c)
        axes = tuple(range(xr.ndim - 1))
        mean = jnp.mean(xr, axis=axes)
        var = jnp.mean(jnp.square(xr), axis=axes) - jnp.square(mean)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        mean_f = jnp.tile(mean, g)
        inv_f = jnp.tile(scale * jax.lax.rsqrt(var + self.epsilon), g)
        bias_f = jnp.tile(bias, g)
        return (x.astype(jnp.float32) - mean_f) * inv_f + bias_f


# ---------------------------------------------------------------------------
# folded block modules (param trees identical to blocks.ConvBlock /
# DeconvBlock / PlainConv so execution plans are interchangeable)
# ---------------------------------------------------------------------------

class _FoldedConv(nn.Module):
    """Canonical conv params, folded execution.  stride=1: folded in/out;
    stride=2: folded in, plain NDHWC/NHWC out."""

    features: int
    d: int              # depth planes folded into the input (1 for 2D)
    kernel: int
    stride: int
    dims: int
    use_bias: bool
    dtype: Dtype
    bias_fan_in: int = 0  # >0: torch conv bias init (PlainConv semantics)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1] // (self.d * 4)
        shape = (self.kernel,) * self.dims + (ci, self.features)
        k = self.param("kernel", torch_conv_kernel_init, shape, jnp.float32)
        x = x.astype(self.dtype)
        k = k.astype(self.dtype)
        if self.stride == 1:
            kf, pad = folded_kernel_s1(k, self.d, self.dims)
            y = _conv2d(x, kf, pad)
            g = self.d * 4
        else:
            kf, pad, do = folded_kernel_s2(k, self.d, self.dims)
            y = _conv2d(x, kf, pad)
            g = 1
            if self.dims == 3:
                n, h2, w2, _ = y.shape
                y = y.reshape(n, h2, w2, do, self.features).transpose(0, 3, 1, 2, 4)
        if self.use_bias:
            if self.bias_fan_in:
                fan = self.bias_fan_in
                init = lambda key, s, d=jnp.float32: torch_conv_bias_init(  # noqa: E731
                    key, s, d, fan
                )
            else:
                init = nn.initializers.zeros
            b = self.param("bias", init, (self.features,), jnp.float32)
            y = y + jnp.tile(b.astype(self.dtype), g)
        return y


class _FoldedDeconv(nn.Module):
    """Canonical ConvTranspose params (transpose layout), folded output."""

    features: int
    d_in: int
    dims: int
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dims == 3:
            ci = x.shape[-1]
            x = fold_depth(x)
        else:
            ci = x.shape[-1]
        shape = (3,) * self.dims + (self.features, ci)
        k = self.param("kernel", torch_conv_kernel_init, shape, jnp.float32)
        kf, pad, _ = folded_kernel_deconv(
            k.astype(self.dtype), self.d_in if self.dims == 3 else 1, self.dims
        )
        y = _conv2d(x.astype(self.dtype), kf, pad)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            g = (2 * self.d_in if self.dims == 3 else 1) * 4
            y = y + jnp.tile(b.astype(self.dtype), g)
        return y


class FoldedConvBlock(nn.Module):
    """ConvBlock twin executing in folded space (see blocks.ConvBlock)."""

    features: int
    d: int
    kernel: int = 3
    stride: int = 1
    dims: int = 3
    relu: bool = True
    bn: bool = True
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _FoldedConv(
            self.features, self.d, self.kernel, self.stride, self.dims,
            use_bias=not self.bn, dtype=self.dtype, name="conv",
        )(x)
        if self.bn:
            if self.stride == 1:
                x = FoldedBatchNorm(
                    self.features, self.d * 4, momentum=1.0 - self.bn_momentum,
                    name="bn",
                )(x, use_running_average=not train)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=1.0 - self.bn_momentum, epsilon=1e-5,
                    dtype=jnp.float32 if train else self.dtype, name="bn",
                )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class FoldedDeconvBlock(nn.Module):
    """DeconvBlock twin: plain (NDHWC) in, folded out."""

    features: int
    d_in: int
    dims: int = 3
    relu: bool = True
    bn: bool = True
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _FoldedDeconv(
            self.features, self.d_in, self.dims,
            use_bias=not self.bn, dtype=self.dtype, name="conv",
        )(x)
        if self.bn:
            g = (2 * self.d_in if self.dims == 3 else 1) * 4
            x = FoldedBatchNorm(
                self.features, g, momentum=1.0 - self.bn_momentum, name="bn",
            )(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


class FoldedPlainConv(nn.Module):
    """PlainConv twin (stride-1, folded in/out); params under "conv"
    like blocks.PlainConv."""

    features: int
    d: int
    kernel: int = 3
    dims: int = 3
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1] // (self.d * 4)
        return _FoldedConv(
            self.features, self.d, self.kernel, 1, self.dims,
            use_bias=self.use_bias, dtype=self.dtype,
            bias_fan_in=ci * self.kernel ** self.dims, name="conv",
        )(x)
