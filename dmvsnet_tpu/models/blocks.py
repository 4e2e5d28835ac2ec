"""Conv / deconv / batch-norm building blocks (flax.linen, channels-last).

These re-create the reference block semantics (reference
networks/module.py:28-208) on NHWC / NDHWC layouts:

* convolutions use explicit symmetric torch-style padding (k//2 each
  side) — NOT XLA 'SAME', whose lopsided padding at even sizes would
  shift activations relative to the reference;
* transposed convolutions reproduce
  ``nn.ConvTranspose{2,3}d(k=3, stride=2, padding=1, output_padding=1)``
  exactly (output = 2x input) via ``lax.conv_transpose`` with padding
  (k-1-p, k-1-p+op) and ``transpose_kernel=True``;
* batch norm uses momentum 0.1 in torch convention (flax momentum 0.9)
  and eps 1e-5.  Under ``jax.jit`` over a sharded mesh the batch-stat
  reductions are global, which reproduces SyncBatchNorm
  (reference model.py:36-37) with zero extra code;
* weights default to torch's conv initialization
  (U(±1/sqrt(fan_in))) so training dynamics track the reference recipe.

Compute dtype is a parameter: bf16 feeds the MXU at full rate; params
and BN statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Conv*d default: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in))
torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_conv_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv3d_ddense(x: jnp.ndarray, kernel: jnp.ndarray, stride: int) -> jnp.ndarray:
    """k-tap conv3d as ONE dense conv2d with the whole depth axis folded
    into channels and a band-masked kernel.

    For few-plane volumes (D < ~16) the D/3-fold FLOP redundancy of the
    dense D-mixing is far cheaper than the conv emitter's handling of
    small-channel NDHWC convs (7-8x faster at stage-3 shapes).  Exact.
    """
    b, d, h, w, ci = x.shape
    kd_taps = kernel.shape[0]
    co = kernel.shape[-1]
    do = (d + 1) // 2 if stride == 2 else d
    zeros = jnp.zeros(kernel.shape[1:3] + (ci, co), kernel.dtype)
    cols = []
    for od in range(do):
        center = od * stride
        rows = []
        for dd in range(d):
            dz = dd - center + kd_taps // 2
            rows.append(kernel[dz] if 0 <= dz < kd_taps else zeros)
        cols.append(jnp.concatenate(rows, axis=2))
    kd = jnp.concatenate(cols, axis=3)  # (kh, kw, D*Ci, Do*Co)
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * ci)
    y = jax.lax.conv_general_dilated(
        x2, kd, (stride, stride),
        [(kernel.shape[1] // 2,) * 2, (kernel.shape[2] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, y.shape[1], y.shape[2], do, co).transpose(0, 3, 1, 2, 4)


def conv3d_dstack(x: jnp.ndarray, kernel: jnp.ndarray, stride: int) -> jnp.ndarray:
    """k-tap conv3d expressed as ONE conv2d with D-shifted copies stacked
    into channels (kernel (kd,kh,kw,Ci,Co) -> (kh,kw,kd*Ci,Co)).

    TPU's conv emitter runs full-volume small-channel conv3ds ~5x slower
    than the same FLOPs through conv2d; stacking the kd depth taps into
    the channel axis triples the contraction width and lets the batch
    axis carry D.  Exact (same reduction, reordered).
    """
    b, d, h, w, ci = x.shape
    kd = kernel.shape[0]
    pad = kd // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    x2 = jnp.concatenate([xp[:, dz:dz + d] for dz in range(kd)], axis=-1)
    if stride > 1:
        # torch stride-s windows are centered at input rows 0, s, 2s, ...
        x2 = x2[:, ::stride]
    x2 = x2.reshape(-1, h, w, kd * ci)
    k2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
        kernel.shape[1], kernel.shape[2], kd * ci, -1
    )
    y = jax.lax.conv_general_dilated(
        x2, k2, (stride, stride),
        [(kernel.shape[1] // 2,) * 2, (kernel.shape[2] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, -1, *y.shape[1:])


class _Conv3dDDense(nn.Module):
    """A conv3d with nn.Conv-compatible params applied via conv3d_ddense."""

    features: int
    kernel: int
    stride: int
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.param(
            "kernel", torch_conv_kernel_init,
            (self.kernel,) * 3 + (x.shape[-1], self.features), jnp.float32,
        )
        # ddense beat both the direct emitter and the D-stacked route at
        # every shape this network uses (D in 4..64) — the band-masked
        # dense kernel's FLOP redundancy is cheaper than bad layouts.
        y = conv3d_ddense(
            x.astype(self.dtype), k.astype(self.dtype), self.stride
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(self.dtype)
        return y


class ConvBlock(nn.Module):
    """Conv{2,3}d + optional BatchNorm + optional ReLU.

    Mirrors reference networks/module.py:28-63 (2D) / :120-157 (3D):
    bias only when bn is off; torch-symmetric padding.  3x3x3 3D convs
    run through conv3d_ddense (numerically the same op; ~2-5x faster on
    the TPU conv emitter at the small channel counts of this network).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dims: int = 2
    relu: bool = True
    bn: bool = True
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        if self.dims == 3 and self.kernel == 3:
            x = _Conv3dDDense(
                self.features, self.kernel, self.stride,
                use_bias=not self.bn, dtype=self.dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel,) * self.dims,
                strides=(self.stride,) * self.dims,
                padding=[(pad, pad)] * self.dims,
                use_bias=not self.bn,
                kernel_init=torch_conv_kernel_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.bn:
            # Train: statistics and normalization in fp32 (parity with the
            # torch recipe; stats are fp32 buffers either way).  Eval: BN
            # is a constant affine of the running stats, so compute it in
            # the block dtype — under bf16 nets this keeps the conv ->
            # scale-shift -> relu chain entirely bf16 (XLA fuses it into
            # the conv epilogue) instead of paying fp32 convert pairs and
            # fp32 HBM traffic around every conv (the reason bf16 nets
            # measured only 3-11% despite byte-halved rooflines, r4/r5
            # STAGETIME).  Numerics-gated: NUMERICS.json *_bf16 keys.
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=1e-5,
                dtype=jnp.float32 if train else self.dtype,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBlock(nn.Module):
    """ConvTranspose{2,3}d(k, stride=2, padding=1, output_padding=1) + BN + ReLU.

    Output spatial size is exactly 2x the input (the reference's stride-2
    crop at networks/module.py:104-106 is a no-op for these parameters).
    ``transpose_kernel=True`` gives gradient-of-conv semantics, i.e. the
    same operator as torch's ConvTranspose, so converted checkpoints are
    bit-compatible up to layout.
    """

    features: int
    kernel: int = 3
    dims: int = 2
    relu: bool = True
    bn: bool = True
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad, out_pad = self.kernel // 2, 1
        lo = self.kernel - 1 - pad
        # native ConvTranspose: the dilated-conv and subpixel reformulations
        # both lost to it here (zero-dense FLOPs and strided-scatter layouts)
        x = nn.ConvTranspose(
            self.features,
            kernel_size=(self.kernel,) * self.dims,
            strides=(2,) * self.dims,
            padding=[(lo, lo + out_pad)] * self.dims,
            use_bias=not self.bn,
            transpose_kernel=True,
            kernel_init=torch_conv_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.bn:
            # fp32 in train, block-dtype affine in eval — see ConvBlock
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=1e-5,
                dtype=jnp.float32 if train else self.dtype,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class PlainConv(nn.Module):
    """A bare conv (no bn / relu), torch padding; used by the FPN heads.

    Matches the raw ``nn.Conv2d`` layers at reference
    networks/module.py:301-309 and the prob heads at :379,:421.
    """

    features: int
    kernel: int = 1
    dims: int = 2
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel // 2
        fan_in = x.shape[-1] * self.kernel ** self.dims
        if self.dims == 3 and self.kernel == 3 and not self.use_bias:
            return _Conv3dDDense(
                self.features, self.kernel, 1, use_bias=False,
                dtype=self.dtype, name="conv",
            )(x)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel,) * self.dims,
            padding=[(pad, pad)] * self.dims,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_conv_bias_init(k, s, d, fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample over the two axes before channels.

    Exact equivalent of ``F.interpolate(scale_factor=2, mode='nearest')``
    (reference networks/module.py:328,333) for integer scale 2.
    """
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)
