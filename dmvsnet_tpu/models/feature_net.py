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

from dmvsnet_tpu.models import folded
from dmvsnet_tpu.models.blocks import ConvBlock, PlainConv, upsample_nearest_2x


class FeatureNet(nn.Module):
    """fold_level0=True runs the full-resolution level (conv0_* and the
    stage-3 FPN head) in 2x2 folded space (models/folded.py): identical
    params/numerics, 4x operand widths.  Measured on v5e (CHIPRUN.log r3)
    the folded feature net is SLOWER (56.2 ms vs 45.3 unfolded) — the 4x
    FLOP inflation of dense folding outweighs the MXU-utilization gain at
    these shapes — so the default is False.  The switch stays for A/B
    re-measurement on other chips."""

    base_channels: int = 8
    dtype: Any = jnp.float32
    fold_level0: bool = False  # A/B switch; params identical either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict[str, jnp.ndarray]:
        """x: (N, H, W, 3) -> {stage1..3, stage1_c..3_c} feature maps."""
        c = self.base_channels
        conv = lambda f, k, s, name: ConvBlock(  # noqa: E731
            f, kernel=k, stride=s, dtype=self.dtype, name=name
        )
        fconv = lambda f, k, s, name: folded.FoldedConvBlock(  # noqa: E731
            f, d=1, kernel=k, stride=s, dims=2, dtype=self.dtype, name=name
        )
        use_fold = (
            self.fold_level0 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        )

        if use_fold:
            xf = folded.fold2d(x)
            x0 = fconv(c, 3, 1, "conv0_0")(xf, train)
            conv0 = fconv(c, 3, 1, "conv0_1")(x0, train)   # folded, 4c ch
            x1 = fconv(c * 2, 5, 2, "conv1_0")(conv0, train)  # plain 1/2 res
        else:
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

        if use_fold:
            # nearest-2x upsample == tiling the half-res pixel across the
            # 4 fold phases (phase-major layout)
            intra_f = jnp.tile(intra, (1, 1, 1, 4)) + folded.FoldedPlainConv(
                c * 4, d=1, kernel=1, dims=2, use_bias=True,
                dtype=self.dtype, name="inner2",
            )(conv0)
            outf = folded.FoldedPlainConv(
                c * 2, d=1, kernel=3, dims=2, use_bias=False,
                dtype=self.dtype, name="out3",
            )(intra_f)
            out = folded.unfold2d(outf, c * 2)
        else:
            intra = upsample_nearest_2x(intra) + PlainConv(
                c * 4, kernel=1, use_bias=True, dtype=self.dtype, name="inner2"
            )(conv0)
            out = PlainConv(c * 2, kernel=3, use_bias=False, dtype=self.dtype, name="out3")(intra)
        outputs["stage3"], outputs["stage3_c"] = jnp.split(out, 2, axis=-1)
        return outputs
