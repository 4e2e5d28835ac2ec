"""Cost-volume regularization: dual ("small"/"huge" depth cell) 3D U-Nets.

Re-creates reference networks/module.py:342-436 in NDHWC: each of the two
independent branches is a 3-level 3D U-Net (stride-2 at each level,
additive skips) with a 2-channel head; the refine variant collapses the
4-plane depth axis at the bottleneck and runs 2D convs there.

Cost volumes are (B, D, H, W, C).  Conv3d on NDHWC maps directly onto
XLA's conv_general_dilated and, through it, the MXU.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dmvsnet_tpu.models import folded
from dmvsnet_tpu.models.blocks import ConvBlock, DeconvBlock, PlainConv


def _use_folded_level0(x: jnp.ndarray) -> bool:
    """Fold the full-resolution U-Net level into 2x2-space-to-depth +
    depth-dense channels when the folded width still fits one MXU
    contraction comfortably.  Pure relayout (folded.py) — numerics are
    identical, so the dispatch can be purely shape-driven.  True at the
    DTU-eval stage-3 sweep (D=8 -> 64ch) and every refine pass (D=4);
    false at stages 1-2, whose ddense channels are already MXU-wide and
    would pay a 4x dense-fold FLOP inflation for nothing."""
    b, d, h, w, c = x.shape
    return d * 4 * c <= 128 and d % 2 == 0 and h % 2 == 0 and w % 2 == 0


class CostRegNetPart(nn.Module):
    """One 3D U-Net branch (reference networks/module.py:358-398).

    The full-resolution level (conv0 / conv1 / conv11 / prob) optionally
    executes in folded space (see _use_folded_level0): the level-0
    tensors at stage 3 are 864x1152 with 8-16 effective channels, which
    runs ~5x under the wide-stage conv rate; folding restores MXU-shaped
    operands with identical parameters and numerics."""

    base_channels: int = 8
    dtype: Any = jnp.float32
    fold_level0: bool = True  # A/B switch; params identical either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = self.base_channels
        d = x.shape[1]
        c3 = lambda f, s, name: ConvBlock(  # noqa: E731
            f, kernel=3, stride=s, dims=3, dtype=self.dtype, name=name
        )
        d3 = lambda f, name: DeconvBlock(f, kernel=3, dims=3, dtype=self.dtype, name=name)  # noqa: E731

        if self.fold_level0 and _use_folded_level0(x):
            xf = folded.fold3d(x)
            conv0 = folded.FoldedConvBlock(
                b, d=d, dtype=self.dtype, name="conv0")(xf, train)
            c1 = folded.FoldedConvBlock(
                b * 2, d=d, stride=2, dtype=self.dtype, name="conv1")(conv0, train)
            conv2 = c3(b * 2, 1, "conv2")(c1, train)
            conv4 = c3(b * 4, 1, "conv4")(c3(b * 4, 2, "conv3")(conv2, train), train)
            y = c3(b * 8, 1, "conv6")(c3(b * 8, 2, "conv5")(conv4, train), train)
            y = conv4 + d3(b * 4, "conv7")(y, train)
            y = conv2 + d3(b * 2, "conv9")(y, train)
            yf = conv0 + folded.FoldedDeconvBlock(
                b, d_in=d // 2, dtype=self.dtype, name="conv11")(y, train)
            probf = folded.FoldedPlainConv(
                2, d=d, dtype=self.dtype, name="prob")(yf)
            return folded.unfold3d(probf, d, 2)

        conv0 = c3(b, 1, "conv0")(x, train)
        conv2 = c3(b * 2, 1, "conv2")(c3(b * 2, 2, "conv1")(conv0, train), train)
        conv4 = c3(b * 4, 1, "conv4")(c3(b * 4, 2, "conv3")(conv2, train), train)
        y = c3(b * 8, 1, "conv6")(c3(b * 8, 2, "conv5")(conv4, train), train)
        y = conv4 + d3(b * 4, "conv7")(y, train)
        y = conv2 + d3(b * 2, "conv9")(y, train)
        y = conv0 + d3(b, "conv11")(y, train)
        return PlainConv(2, kernel=3, dims=3, use_bias=False, dtype=self.dtype, name="prob")(y)


class CostRegNetPartRefine(nn.Module):
    """Refine branch: 2D bottleneck at the collapsed D=1 level
    (reference networks/module.py:400-436; input always has D=4)."""

    base_channels: int = 8
    dtype: Any = jnp.float32
    fold_level0: bool = True  # A/B switch; params identical either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = self.base_channels
        d = x.shape[1]
        c3 = lambda f, s, name: ConvBlock(  # noqa: E731
            f, kernel=3, stride=s, dims=3, dtype=self.dtype, name=name
        )
        c2 = lambda f, s, name: ConvBlock(  # noqa: E731
            f, kernel=3, stride=s, dims=2, dtype=self.dtype, name=name
        )

        use_fold = self.fold_level0 and _use_folded_level0(x)
        if use_fold:
            xf = folded.fold3d(x)
            conv0 = folded.FoldedConvBlock(
                b, d=d, dtype=self.dtype, name="conv0")(xf, train)
            c1 = folded.FoldedConvBlock(
                b * 2, d=d, stride=2, dtype=self.dtype, name="conv1")(conv0, train)
            conv2 = c3(b * 2, 1, "conv2")(c1, train)              # D=2
        else:
            conv0 = c3(b, 1, "conv0")(x, train)                  # D=4
            conv2 = c3(b * 2, 1, "conv2")(c3(b * 2, 2, "conv1")(conv0, train), train)
        conv4 = c3(b * 4, 1, "conv4")(c3(b * 4, 2, "conv3")(conv2, train), train)  # D=1
        conv4_2d = jnp.squeeze(conv4, axis=1)
        y = c2(b * 8, 2, "conv5")(conv4_2d, train)
        y = c2(b * 8, 1, "conv6")(y, train)
        y = conv4_2d + DeconvBlock(b * 4, kernel=3, dims=2, dtype=self.dtype, name="conv7")(y, train)
        y = jnp.expand_dims(y, axis=1)                            # D=1
        y = conv2 + DeconvBlock(b * 2, kernel=3, dims=3, dtype=self.dtype, name="conv9")(y, train)
        if use_fold:
            yf = conv0 + folded.FoldedDeconvBlock(
                b, d_in=d // 2, dtype=self.dtype, name="conv11")(y, train)
            probf = folded.FoldedPlainConv(
                2, d=d, dtype=self.dtype, name="prob")(yf)
            return folded.unfold3d(probf, d, 2)
        y = conv0 + DeconvBlock(b, kernel=3, dims=3, dtype=self.dtype, name="conv11")(y, train)
        return PlainConv(2, kernel=3, dims=3, use_bias=False, dtype=self.dtype, name="prob")(y)


class CostRegNet(nn.Module):
    """Dual branch: small + huge concatenated to 4 channels
    (reference networks/module.py:342-349)."""

    base_channels: int = 8
    dtype: Any = jnp.float32
    fold_level0: bool = True  # A/B switch; params identical either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        small = CostRegNetPart(self.base_channels, self.dtype,
                               self.fold_level0, name="cosR_small")(x, train)
        huge = CostRegNetPart(self.base_channels, self.dtype,
                              self.fold_level0, name="cosR_huge")(x, train)
        return jnp.concatenate([small, huge], axis=-1)


class CostRegNetRefine(nn.Module):
    """Dual refine branch (reference networks/module.py:350-357)."""

    base_channels: int = 8
    dtype: Any = jnp.float32
    fold_level0: bool = True  # A/B switch; params identical either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        small = CostRegNetPartRefine(self.base_channels, self.dtype,
                                     self.fold_level0, name="cosR_small")(x, train)
        huge = CostRegNetPartRefine(self.base_channels, self.dtype,
                                    self.fold_level0, name="cosR_huge")(x, train)
        return jnp.concatenate([small, huge], axis=-1)


class AggWeightNetVolume(nn.Module):
    """Per-voxel aggregation weight net for the "adaptive" cost mode
    (reference networks/module.py:437-451; unused by shipped configs but
    part of the API surface)."""

    hid_channels: int = 1
    out_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBlock(self.hid_channels, kernel=1, dims=3, dtype=self.dtype, name="w0")(x, train)
        return ConvBlock(self.out_channels, kernel=1, dims=3, dtype=self.dtype, name="w1")(y, train)
