"""Feature pyramid network (the reference's "fpn" FeatureNet).

3-scale encoder + top-down FPN with double-width output heads whose
channels split into a "main" half (first cost pass) and a "_c" half
(checkerboard refine pass) — reference networks/module.py:274-340.

Stage channel widths with base_channels=8: stage1 32(+32) at 1/4,
stage2 16(+16) at 1/2, stage3 8(+8) at full resolution.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from dmvsnet_tpu.models.blocks import ConvBlock, PlainConv, upsample_nearest_2x


class FeatureNet(nn.Module):
    base_channels: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict[str, jnp.ndarray]:
        """x: (N, H, W, 3) -> {stage1..3, stage1_c..3_c} feature maps."""
        c = self.base_channels
        conv = lambda f, k, s, name: ConvBlock(  # noqa: E731
            f, kernel=k, stride=s, dtype=self.dtype, name=name
        )

        x0 = conv(c, 3, 1, "conv0_0")(x, train)
        conv0 = conv(c, 3, 1, "conv0_1")(x0, train)

        x1 = conv(c * 2, 5, 2, "conv1_0")(conv0, train)
        x1 = conv(c * 2, 3, 1, "conv1_1")(x1, train)
        conv1 = conv(c * 2, 3, 1, "conv1_2")(x1, train)

        x2 = conv(c * 4, 5, 2, "conv2_0")(conv1, train)
        x2 = conv(c * 4, 3, 1, "conv2_1")(x2, train)
        conv2 = conv(c * 4, 3, 1, "conv2_2")(x2, train)

        outputs = {}
        intra = conv2
        out = PlainConv(c * 8, kernel=1, use_bias=False, dtype=self.dtype, name="out1")(intra)
        outputs["stage1"], outputs["stage1_c"] = jnp.split(out, 2, axis=-1)

        intra = upsample_nearest_2x(intra) + PlainConv(
            c * 4, kernel=1, use_bias=True, dtype=self.dtype, name="inner1"
        )(conv1)
        out = PlainConv(c * 4, kernel=3, use_bias=False, dtype=self.dtype, name="out2")(intra)
        outputs["stage2"], outputs["stage2_c"] = jnp.split(out, 2, axis=-1)

        intra = upsample_nearest_2x(intra) + PlainConv(
            c * 4, kernel=1, use_bias=True, dtype=self.dtype, name="inner2"
        )(conv0)
        out = PlainConv(c * 2, kernel=3, use_bias=False, dtype=self.dtype, name="out3")(intra)
        outputs["stage3"], outputs["stage3_c"] = jnp.split(out, 2, axis=-1)
        return outputs
