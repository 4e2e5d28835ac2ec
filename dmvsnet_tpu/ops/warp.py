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


def bilinear_sample_quad(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """bilinear_sample via ONE gather of pre-packed 2x2 quads.

    TPU gathers cost per-row-take, not per-byte, so packing the four
    bilinear taps of each pixel into one (4C)-wide row quarters the
    gather count.  A one-pixel zero ring around the source reproduces
    grid_sample's zero padding exactly: taps one pixel outside the image
    read zeros from the ring; anything farther is zero-weighted.

    Args:
      img: (H, W, C); x, y: same-shaped pixel coordinates.

    Returns:
      (*x.shape, C), identical values to bilinear_sample.
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

    fp = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [fp[:-1, :-1], fp[:-1, 1:], fp[1:, :-1], fp[1:, 1:]], axis=-1
    )  # (H+1, W+1, 4C); quad[y+1, x+1] = taps at {y,y+1}x{x,x+1} of img

    # base position in the padded frame; in-ring bases read zeros, farther
    # ones are clamped and fully zero-weighted
    xi = jnp.clip(x0i + 1, 0, w)
    yi = jnp.clip(y0i + 1, 0, h)
    covered = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)

    g = jnp.take(
        quad.reshape(-1, 4 * c), (yi * (w + 1) + xi).reshape(-1), axis=0
    ).reshape(*x.shape, 4, c)
    wts = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    ) * covered[..., None]
    # exact fp32: TPU DEFAULT precision would run this 4-tap contraction
    # through bf16 MXU passes (core/geometry.py docstring)
    return jnp.einsum("...t,...tc->...c", wts.astype(g.dtype), g,
                      precision=jax.lax.Precision.HIGHEST)


# which bilinear path aggregate_cost_volume uses: "quad" (packed single
# gather, TPU-fast) or "taps" (4 separate gathers, the didactic reference)
WARP_IMPL = "taps"


def warp_src_feature(
    src_feat: jnp.ndarray,
    src_proj2: jnp.ndarray,
    ref_proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
    impl: str | None = None,
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
    sampler = {
        "quad": bilinear_sample_quad,
        "taps": bilinear_sample,
    }[impl or WARP_IMPL]
    return jax.vmap(sampler)(src_feat, px, py)


def plane_sweep_corr_cm(
    src_feat: jnp.ndarray,
    ref_feat: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    groups: int = 2,
) -> jnp.ndarray:
    """One view's plane-sweep group correlation, CHANNEL-MAJOR layout:
    functionally group_correlation(warp(src), ref) but with W on the TPU
    lane axis in every intermediate — including the VJP's saved
    residuals.

    The flat-index bilinear path (bilinear_sample) is fine as a semantic
    reference, but differentiating it at train shapes is catastrophic on
    TPU: its backward saves s32[1, D*H*W, 1] gather indices and a
    (..., k, g) 6-D product whose tiny trailing dims XLA pads 64-128x —
    the round-4 chip run OOM'd at 364 GB of HBM temps through exactly
    this path (the dead-but-allocated XLA fallback branch of the Pallas
    span cond).  Here every gather index / weight / product is (D, H, W)
    or (C, D, H, W) with W minor, so nothing pads pathologically.

    Args:
      src_feat, ref_feat: (H, W, C); rel_proj: (4, 4) fused relative
      projection; depth_values: (D, H, W).

    Returns:
      (G, D, H, W) correlation (channel-major; callers transpose/tile).
    """
    h, w, c = src_feat.shape
    px, py = geometry.plane_sweep_coords(
        rel_proj[None], depth_values[None], h, w
    )
    px = jax.lax.stop_gradient(px[0]).astype(jnp.float32)  # (D, H, W)
    py = jax.lax.stop_gradient(py[0]).astype(jnp.float32)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    src_cm = jnp.transpose(src_feat, (2, 0, 1)).reshape(c, h * w)

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # (D, H, W)
        vals = jnp.take(src_cm, idx, axis=1)  # (C, D, H, W)
        return vals * (wgt * valid)[None]

    warped = (
        tap(x0i, y0i, (1 - wx) * (1 - wy))
        + tap(x0i + 1, y0i, wx * (1 - wy))
        + tap(x0i, y0i + 1, (1 - wx) * wy)
        + tap(x0i + 1, y0i + 1, wx * wy)
    )  # (C, D, H, W)
    ref_cm = jnp.transpose(ref_feat, (2, 0, 1))  # (C, H, W)
    prod = warped * ref_cm[:, None]
    # channel c = k*groups + g with g fastest (reference view(b, c//2, 2)):
    # mean over k within each group
    d = depth_values.shape[0]
    return prod.reshape(c // groups, groups, d, h, w).mean(0)


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


def aggregate_cost_volume_view_sharded(
    features: list[jnp.ndarray],
    proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
    mesh,
    groups: int = 2,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """aggregate_cost_volume with the V-1 source views SHARDED over the
    mesh's "vp" axis (SURVEY §2.8 long-axis north star).

    Each vp shard warps + correlates its local subset of source views
    (Pallas kernel or XLA gather path) and one ``psum`` over vp produces
    the replicated 2-channel cost volume.  The view sum of reference
    networks/mvsnet.py:142-146 is associative, so this reproduces the
    serial result up to fp reassociation (parity-tested on the virtual
    mesh, tests/test_sharding.py).

    Args:
      features: per-view [(B, H, W, C)], index 0 = reference view.
      proj2: (B, V, 2, 4, 4); depth_values: (B, D) or (B, D, H, W).
      mesh: a Mesh with a "vp" axis whose size divides V-1.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    from dmvsnet_tpu.parallel.mesh import AXIS_VIEW

    v1 = len(features) - 1
    vp = mesh.shape[AXIS_VIEW]
    if v1 % vp:
        raise ValueError(f"vp={vp} must divide the {v1} source views")
    b, h, w, _ = features[0].shape
    ref = features[0]
    src = jnp.stack(features[1:], 0)  # (V1, B, H, W, C)
    fused = geometry.fuse_projection(proj2)
    rel = jnp.stack(
        [geometry.relative_projection(fused[:, v], fused[:, 0])
         for v in range(1, v1 + 1)], 0,
    )  # (V1, B, 4, 4)
    if depth_values.ndim == 2:
        dv = jnp.broadcast_to(
            depth_values[:, :, None, None], (b, depth_values.shape[1], h, w)
        )
    else:
        dv = depth_values

    def body(src_s, rel_s, ref, dv):
        total = None
        for i in range(v1 // vp):
            if use_pallas:
                from dmvsnet_tpu.ops.pallas.warp_correlate import (
                    plane_sweep_corr_view,
                )

                corr = jnp.stack([
                    plane_sweep_corr_view(
                        src_s[i, bi], ref[bi], rel_s[i, bi], dv[bi],
                        interpret=interpret,
                    )
                    for bi in range(b)
                ])
            else:
                px, py = geometry.plane_sweep_coords(rel_s[i], dv, h, w)
                px = jax.lax.stop_gradient(px)
                py = jax.lax.stop_gradient(py)
                warped = jax.vmap(bilinear_sample)(src_s[i], px, py)
                corr = group_correlation(warped, ref, groups)
            corr = corr.astype(jnp.float32)
            total = corr if total is None else total + corr
        return jax.lax.psum(total, AXIS_VIEW)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS_VIEW), P(AXIS_VIEW), P(), P()),
        out_specs=P(),
        check_vma=False,  # pallas_call inside can't annotate varying axes
    )(src, rel, ref, dv)


def aggregate_cost_volume_adaptive(
    features: list[jnp.ndarray],
    proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
    weight_fn,
    groups: int = 2,
) -> jnp.ndarray:
    """"adaptive" aggregation: per-view correlations weighted by a learned
    per-voxel gate before summing.

    The reference constructs AggWeightNetVolume for this mode but its
    forward never invokes it (reference networks/mvsnet.py:102-153 has no
    adaptive branch); this is the working realization: weight =
    sigmoid(weight_fn(per-view correlation)).

    Args:
      weight_fn: (B, D, H, W, groups) -> (B, D, H, W, 1) logits.
    """
    ref_feat = features[0]
    similarity = None
    for v, src_feat in enumerate(features[1:], start=1):
        warped = warp_src_feature(src_feat, proj2[:, v], proj2[:, 0], depth_values)
        corr = group_correlation(warped, ref_feat, groups).astype(jnp.float32)
        gate = jax.nn.sigmoid(weight_fn(corr).astype(jnp.float32))
        corr = corr * gate
        similarity = corr if similarity is None else similarity + corr
    return similarity
