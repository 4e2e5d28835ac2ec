"""Epipolar rectification for 1-D plane sweeps (closed form, pure jnp).

For a (ref, src) pair with fused relative projection ``rel`` (the matrix
the plane sweep uses, core/geometry.py:71), the projected source
position of ref pixel h at depth d is q(d) ∝ M h + t/d with
M = rel[:3,:3], t = rel[:3,3].  All q(d) lie on the epipolar line
through the epipole e ∝ t.  A homography H0 that maps e to the
horizontal point at infinity makes every epipolar line a SCANLINE; the
matched pair (H_src = S_src H0, H_ref = S_ref H0 M) with a SHARED
vertical similarity puts corresponding pixels on the same row:

  rect-ref pixel h_hat = proj(S_ref H0 M h)
  match at depth d:      x = px_inf(h_hat) + b(h_hat) / d,  y = y_hat
  px_inf(h_hat) = (s_xs / s_xr) x_hat + const          (affine, exact)
  b(h_hat)      = s_xs * w0 * (g . (x_hat, y_hat, 1))  (affine, exact)

with w = H0 t = (w0, 0, 0) by construction and g = row 3 of
(S_ref H0 M)^{-1}.  With inverse-depth-uniform hypotheses
(core/sampling.py: 1/d affine in the plane index) the whole coordinate
field is px(d) = P0 + d * P1 — two per-pixel maps for ALL planes.

The sweep itself then needs ONE 2-D resample per view (rectification)
instead of one per (view, plane); the per-plane work collapses to a 1-D
lerp along lanes.  The cost volume is computed on the rect grid and
un-rectified once (depth-independent coords).  This is an APPROXIMATION
of the direct per-pixel sweep: the two resamples low-pass the features
and the checkerboard hypothesis offsets — accuracy is gated empirically
(tests/test_epipolar.py) before the TPU kernel uses it.

Reference semantics being accelerated: networks/module.py:212-251,
networks/mvsnet.py:131-150.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dmvsnet_tpu.core.geometry import PRECISION, inv3


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 matmul at exact fp32 (TPU DEFAULT precision is bf16 — see
    core/geometry.py docstring; a bf16 pass here measured a constant
    0.25-row rectification shift at H=96)."""
    return jnp.matmul(a, b, precision=PRECISION)


class Rectification(NamedTuple):
    h_ref: jnp.ndarray     # (3,3) ref pixel -> rect grid
    h_src: jnp.ndarray     # (3,3) src pixel -> rect grid
    px_aff: jnp.ndarray    # (3,) px_inf = px_aff . (x_hat, y_hat, 1)
    b_aff: jnp.ndarray     # (3,) b      = b_aff  . (x_hat, y_hat, 1)
    # diagnostics for validity gating
    epipole_dist: jnp.ndarray  # epipole distance from src image center (px)
    scales: jnp.ndarray        # (s_xr, s_xs, s_y) rect scale factors


def apply_h(m: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Homography (3,3) applied to pixel coords -> (x', y')."""
    d = m[2, 0] * x + m[2, 1] * y + m[2, 2]
    d = jnp.where(d == 0.0, d + 1e-9, d)
    return (
        (m[0, 0] * x + m[0, 1] * y + m[0, 2]) / d,
        (m[1, 0] * x + m[1, 1] * y + m[1, 2]) / d,
    )


def compute_rectification(
    rel: jnp.ndarray, height: int, width: int
) -> Rectification:
    """Matched rectifying homographies for one (ref, src) pair.

    The rect grid reuses the (height, width) shape: the ref content is
    similarity-fitted to it exactly; the src side shares the vertical
    fit (rows must align) and fits its own horizontal span.
    """
    m = rel[:3, :3]
    t = rel[:3, 3]
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0

    # epipole in src pixels; direction from image center
    ez = jnp.where(jnp.abs(t[2]) < 1e-12, 1e-12, t[2])
    ex, ey = t[0] / ez, t[1] / ez
    dx, dy = ex - cx, ey - cy
    f = jnp.sqrt(dx * dx + dy * dy)
    f = jnp.maximum(f, 1e-6)
    ct, st = dx / f, dy / f

    trans = jnp.array([[1.0, 0, -cx], [0, 1.0, -cy], [0, 0, 1.0]], jnp.float32)
    rot = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32)
    rot = rot.at[0, 0].set(ct).at[0, 1].set(st).at[1, 0].set(-st).at[1, 1].set(ct)
    g = jnp.eye(3, dtype=jnp.float32).at[2, 0].set(-1.0 / f)
    h0 = _mm(g, _mm(rot, trans))

    hr0 = _mm(h0, m)  # ref -> raw rect
    corners_x = jnp.array([0.0, width - 1.0, 0.0, width - 1.0], jnp.float32)
    corners_y = jnp.array([0.0, 0.0, height - 1.0, height - 1.0], jnp.float32)
    xr, yr = apply_h(hr0, corners_x, corners_y)
    xs, ys = apply_h(h0, corners_x, corners_y)

    # shared vertical fit (ref content drives it), per-side horizontal fit
    sy = (height - 1.0) / jnp.maximum(yr.max() - yr.min(), 1e-6)
    ty = -yr.min() * sy
    sxr = (width - 1.0) / jnp.maximum(xr.max() - xr.min(), 1e-6)
    txr = -xr.min() * sxr
    sxs = (width - 1.0) / jnp.maximum(xs.max() - xs.min(), 1e-6)
    txs = -xs.min() * sxs

    s_ref = jnp.array(
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32
    ).at[0, 0].set(sxr).at[0, 2].set(txr).at[1, 1].set(sy).at[1, 2].set(ty)
    s_src = s_ref.at[0, 0].set(sxs).at[0, 2].set(txs)

    h_ref = _mm(s_ref, hr0)
    h_src = _mm(s_src, h0)

    # px_inf(h_hat) affine: proj_x(S_src S_ref^{-1} h_hat)
    a = _mm(s_src, inv3(s_ref))
    px_aff = a[0]
    # b(h_hat) = sxs * w0 * (row3 of h_ref^{-1}) . h_hat
    w0 = jnp.matmul(h0, t, precision=PRECISION)[0]
    g_row = inv3(h_ref)[2]
    b_aff = sxs * w0 * g_row

    return Rectification(
        h_ref=h_ref, h_src=h_src, px_aff=px_aff, b_aff=b_aff,
        epipole_dist=f, scales=jnp.stack([sxr, sxs, sy]),
    )


def rect_grid_coords(h: jnp.ndarray, height: int, width: int):
    """Inverse-map coords for resampling ONTO the rect grid: for each
    rect pixel (x_hat, y_hat), where to sample the ORIGINAL image."""
    hx = jnp.arange(width, dtype=jnp.float32)
    hy = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(hx, hy)
    return apply_h(inv3(h), gx, gy)


def unrect_grid_coords(h: jnp.ndarray, height: int, width: int):
    """Forward-map coords for resampling BACK to the original grid: for
    each original pixel, where it lives on the rect grid."""
    hx = jnp.arange(width, dtype=jnp.float32)
    hy = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(hx, hy)
    return apply_h(h, gx, gy)


def sweep_coeff_maps(
    rect: Rectification, inv_lo: jnp.ndarray, inv_step: jnp.ndarray,
    height: int, width: int,
):
    """Per-rect-pixel (P0, P1) with px(d) = P0 + d * P1 for plane index d.

    Args:
      rect: the pair's Rectification.
      inv_lo, inv_step: (H, W) per-ORIGINAL-pixel inverse-depth fan
        coefficients (1/depth(d) = inv_lo + d * inv_step); resampled onto
        the rect grid here with the ref homography.
    """
    from dmvsnet_tpu.ops import warp as warp_ops

    sx, sy_ = rect_grid_coords(rect.h_ref, height, width)
    coeffs = warp_ops.bilinear_sample(
        jnp.stack([inv_lo, inv_step], axis=-1), sx, sy_
    )
    hx = jnp.arange(width, dtype=jnp.float32)
    hy = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(hx, hy)
    px_inf = rect.px_aff[0] * gx + rect.px_aff[1] * gy + rect.px_aff[2]
    b = rect.b_aff[0] * gx + rect.b_aff[1] * gy + rect.b_aff[2]
    p0 = px_inf + b * coeffs[..., 0]
    p1 = b * coeffs[..., 1]
    return p0, p1


def rectified_sweep_corr_jnp(
    src_feat: jnp.ndarray,
    ref_feat: jnp.ndarray,
    rel: jnp.ndarray,
    inv_lo: jnp.ndarray,
    inv_step: jnp.ndarray,
    ndepth: int,
    groups: int = 2,
) -> jnp.ndarray:
    """The full rectified sweep as plain jnp (the semantic reference for
    the 1-D TPU kernel, and the accuracy probe for the approximation).

    Args:
      src_feat, ref_feat: (H, W, C) single images.
      rel: (4, 4) relative fused projection.
      inv_lo, inv_step: (H, W) inverse-depth fan (per ORIGINAL ref pixel).

    Returns:
      (D, H, W, groups) correlation volume on the ORIGINAL ref grid.
    """
    from dmvsnet_tpu.ops import warp as warp_ops

    h, w, c = src_feat.shape
    rect = compute_rectification(rel, h, w)

    # one 2-D resample per image (amortized over all D planes)
    sxx, sxy = rect_grid_coords(rect.h_src, h, w)
    src_r = warp_ops.bilinear_sample(src_feat, sxx, sxy)
    rxx, rxy = rect_grid_coords(rect.h_ref, h, w)
    ref_r = warp_ops.bilinear_sample(ref_feat, rxx, rxy)

    p0, p1 = sweep_coeff_maps(rect, inv_lo, inv_step, h, w)
    gy = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)
    )
    ds = jnp.arange(ndepth, dtype=jnp.float32)
    px = p0[None] + ds[:, None, None] * p1[None]      # (D, H, W)
    py = jnp.broadcast_to(gy[None], px.shape)

    # per-plane 1-D (horizontal) lerp == bilinear at (px, y_hat)
    warped = warp_ops.bilinear_sample(src_r, px, py)   # (D, H, W, C)
    corr_r = warp_ops.group_correlation(
        warped[None], ref_r[None], groups
    )[0]                                               # (D, H, W, G)

    # un-rectify once (depth-independent coords)
    ux, uy = unrect_grid_coords(rect.h_ref, h, w)
    vol = jnp.moveaxis(corr_r, 0, 2).reshape(h, w, ndepth * groups)
    out = warp_ops.bilinear_sample(vol, ux, uy)
    return jnp.moveaxis(out.reshape(h, w, ndepth, groups), 2, 0)
