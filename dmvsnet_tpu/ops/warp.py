"""Plane-sweep warp + groupwise correlation — jnp reference path.

This is the hot loop of the network (reference networks/mvsnet.py:131-150
+ networks/module.py:212-251): for every source view, bilinear-sample its
feature map at the projection of every (ref pixel, depth hypothesis) and
correlate against the reference features in 2 channel groups.

The jnp implementation here is the semantic reference (validated against
torch.nn.functional.grid_sample in tests); `dmvsnet_tpu.ops.pallas`
provides the fused TPU kernel with the same contract.

Layout: features are channels-last (B, H, W, C); cost volumes are
(B, D, H, W, G) with G=2 groups.  Depth hypotheses stay (B, D, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmvsnet_tpu.core import geometry


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) at pixel coords with zero padding.

    Semantics match ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` after un-normalizing the grid: align_corners=True
    maps the normalized grid linearly onto [0, W-1], so working directly
    in pixel units is exact (reference networks/module.py:240-248).
    Out-of-bounds corner taps contribute zero.

    Args:
      img: (H, W, C).
      x, y: arbitrary (but equal) shaped pixel coordinates.

    Returns:
      (*x.shape, C) sampled values, float32.
    """
    h, w, c = img.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(h * w, c)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)
        return vals * (wgt * valid)[..., None]

    out = (
        tap(x0i, y0i, (1 - wx) * (1 - wy))
        + tap(x0i + 1, y0i, wx * (1 - wy))
        + tap(x0i, y0i + 1, (1 - wx) * wy)
        + tap(x0i + 1, y0i + 1, wx * wy)
    )
    return out


def warp_src_feature(
    src_feat: jnp.ndarray,
    src_proj2: jnp.ndarray,
    ref_proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Homography-warp a source feature map over all depth hypotheses.

    Equivalent of reference networks/module.py:212-251 (homo_warping) with
    the intrinsics fold of networks/mvsnet.py:133-136 done inside.

    Args:
      src_feat: (B, H, W, C) source-view features.
      src_proj2, ref_proj2: (B, 2, 4, 4) stacked cameras at this stage.
      depth_values: (B, D) or (B, D, H, W).

    Returns:
      (B, D, H, W, C) warped features.
    """
    b, h, w, _ = src_feat.shape
    rel = geometry.relative_projection(
        geometry.fuse_projection(src_proj2), geometry.fuse_projection(ref_proj2)
    )
    px, py = geometry.plane_sweep_coords(rel, depth_values, h, w)  # (B, D, H, W)
    # The sampling grid carries no gradient (the reference computes it
    # under torch.no_grad, networks/module.py:222): gradients flow into
    # the warped *values* only, not the projection coordinates.
    px = jax.lax.stop_gradient(px)
    py = jax.lax.stop_gradient(py)
    return jax.vmap(bilinear_sample)(src_feat, px, py)


def group_correlation(
    warped: jnp.ndarray, ref_feat: jnp.ndarray, groups: int = 2
) -> jnp.ndarray:
    """2-group dot-product correlation (reference networks/mvsnet.py:139).

    The reference's ``view(b, c//2, 2, ...)`` splits channel c into
    (k, g) with the group index g fastest, i.e. group g owns channels
    {2k+g}; the correlation is the mean over k of warped*ref.

    Args:
      warped: (B, D, H, W, C); ref_feat: (B, H, W, C).

    Returns:
      (B, D, H, W, groups) similarity volume.
    """
    b, d, h, w, c = warped.shape
    wv = warped.reshape(b, d, h, w, c // groups, groups)
    rv = ref_feat.reshape(b, 1, h, w, c // groups, groups)
    return jnp.mean(wv * rv, axis=-2)


def aggregate_cost_volume(
    features: list[jnp.ndarray],
    proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
    groups: int = 2,
) -> jnp.ndarray:
    """Warp every source view and sum the group correlations.

    The per-view loop of reference networks/mvsnet.py:131-150 ("variance"
    aggregation): an unnormalized sum over source views, kept in the
    reference's serial order so numerics are reproducible.  The loop is
    unrolled under jit (V is static and small), letting XLA fuse each
    warp+correlate pair without materializing all warped volumes at once.

    Args:
      features: per-view list [(B, H, W, C)], index 0 = reference view.
      proj2: (B, V, 2, 4, 4) stacked cameras.
      depth_values: (B, D) or (B, D, H, W).

    Returns:
      (B, D, H, W, groups) cost volume, float32 accumulation.
    """
    ref_feat = features[0]
    similarity = None
    for v, src_feat in enumerate(features[1:], start=1):
        warped = warp_src_feature(src_feat, proj2[:, v], proj2[:, 0], depth_values)
        corr = group_correlation(warped, ref_feat, groups).astype(jnp.float32)
        similarity = corr if similarity is None else similarity + corr
    return similarity
