"""Epipolar rectification: exactness of the geometry, accuracy of the
rectified 1-D sweep vs the direct per-pixel 2-D sweep.

The geometry identities (rows align, disparity affine in inverse depth)
must hold to fp precision; the full rectified sweep is an APPROXIMATION
(two extra resamples), gated here by argmax-plane agreement and value
error on a realistic synthetic pair.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from dmvsnet_tpu.core import epipolar, geometry
from dmvsnet_tpu.ops import warp as warp_ops
from dmvsnet_tpu.utils import synthetic

H, W, C, D = 64, 96, 8, 16


def _smooth(a: np.ndarray, k: int = 2) -> np.ndarray:
    """Cheap separable box blur: conv features are smooth; iid noise is
    the adversarial worst case for ANY resampling comparison (each extra
    bilinear tap decorrelates it) and not representative."""
    for _ in range(k):
        a = 0.25 * (np.roll(a, 1, 0) + np.roll(a, -1, 0)
                    + np.roll(a, 1, 1) + np.roll(a, -1, 1))
    return a


def _pair(angle=0.06, baseline=14.0, seed=0):
    """A realistic DTU-like (ref, src) pair + its relative projection."""
    cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2,
                               tx=-baseline, angle=angle),
    ])
    fused = geometry.fuse_projection(jnp.asarray(cams))
    rel = geometry.relative_projection(fused[1][None], fused[0][None])[0]
    rng = np.random.default_rng(seed)
    feats = [jnp.asarray(_smooth(
        rng.normal(size=(H, W, C))).astype(np.float32)) for _ in range(2)]
    return rel, feats


def test_rectification_rows_align_and_disparity_affine():
    """Core identities: (1) for any ref pixel and ANY depth, the rect-src
    row equals the rect-ref row; (2) the rect-src x is exactly
    px_aff.h + b_aff.h / d."""
    rel, _ = _pair()
    rect = epipolar.compute_rectification(rel, H, W)

    rng = np.random.default_rng(1)
    hx = jnp.asarray(rng.uniform(0, W - 1, 64).astype(np.float32))
    hy = jnp.asarray(rng.uniform(0, H - 1, 64).astype(np.float32))
    rxh, ryh = epipolar.apply_h(rect.h_ref, hx, hy)

    for d in (430.0, 600.0, 910.0):
        px, py = geometry.plane_sweep_coords(
            rel[None], jnp.full((1, 1), d), H, W
        )
        # sample the projected coords at our random pixels via direct math
        m, t = rel[:3, :3], rel[:3, 3]
        p = (m @ jnp.stack([hx, hy, jnp.ones_like(hx)])) * d + t[:, None]
        sxo, syo = p[0] / p[2], p[1] / p[2]
        sxh, syh = epipolar.apply_h(rect.h_src, sxo, syo)
        # (1) same scanline
        np.testing.assert_allclose(np.asarray(syh), np.asarray(ryh),
                                   rtol=0, atol=2e-2)
        # (2) disparity model exact
        ones = jnp.ones_like(rxh)
        px_inf = rect.px_aff[0] * rxh + rect.px_aff[1] * ryh + rect.px_aff[2]
        b = rect.b_aff[0] * rxh + rect.b_aff[1] * ryh + rect.b_aff[2]
        np.testing.assert_allclose(np.asarray(sxh),
                                   np.asarray(px_inf + b / d),
                                   rtol=0, atol=2e-2)


def test_rectified_sweep_exact_for_pure_translation():
    """Zero relative rotation: the rectification degenerates to the
    identity similarity and the rectified sweep must equal the direct
    sweep to fp precision (same taps, same weights)."""
    rel, feats = _pair(angle=0.0, baseline=120.0)
    dmin, dmax = 425.0, 935.0
    inv_lo = jnp.full((H, W), 1.0 / dmin)
    inv_step = jnp.full((H, W), (1.0 / dmax - 1.0 / dmin) / (D - 1))
    ds = jnp.arange(D, dtype=jnp.float32)
    depths = 1.0 / (inv_lo[None] + ds[:, None, None] * inv_step[None])

    px, py = geometry.plane_sweep_coords(rel[None], depths[None], H, W)
    warped = warp_ops.bilinear_sample(feats[1], px[0], py[0])
    direct = warp_ops.group_correlation(warped[None], feats[0][None])[0]
    rectv = epipolar.rectified_sweep_corr_jnp(
        feats[1], feats[0], rel, inv_lo, inv_step, D
    )
    np.testing.assert_allclose(np.asarray(rectv), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_rectified_sweep_depth_decisions_match_rotated():
    """Rotated pair on a textured plane: the rectified sweep is an
    approximation (two extra resamples), but the DECISION it feeds —
    per-pixel argmax depth plane — must agree with the direct sweep
    almost everywhere, and the volumes must correlate strongly."""
    imgs, cams, _ = synthetic.render_plane_views(H, W, 2, depth=600.0,
                                                 baseline=120.0)
    cams[1] = synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2,
                                     tx=-120.0, angle=0.08)
    # re-render view 1 with the rotated camera for true correspondence:
    # cheaper — reuse the planar scene by homography-warping view 0? No:
    # just use the geometric pair on smooth pseudo-features anchored to
    # the plane: sample view-0 texture at view-1's plane intersections.
    fused = geometry.fuse_projection(jnp.asarray(cams))
    rel = geometry.relative_projection(fused[1][None], fused[0][None])[0]
    # plane-induced homography: view-1 image of the z=600 plane
    px0, py0 = geometry.plane_sweep_coords(
        geometry.relative_projection(fused[0][None], fused[1][None]),
        jnp.full((1, 1), 600.0), H, W,
    )
    ref_img = jnp.asarray(
        (imgs[0] - imgs[0].mean((0, 1))).astype(np.float32))
    src_img = warp_ops.bilinear_sample(ref_img, px0[0, 0], py0[0, 0])
    feats = [ref_img[..., :2], src_img[..., :2]]

    dmin, dmax = 450.0, 800.0
    nd = 24
    inv_lo = jnp.full((H, W), 1.0 / dmin)
    inv_step = jnp.full((H, W), (1.0 / dmax - 1.0 / dmin) / (nd - 1))
    ds = jnp.arange(nd, dtype=jnp.float32)
    depths = 1.0 / (inv_lo[None] + ds[:, None, None] * inv_step[None])

    px, py = geometry.plane_sweep_coords(rel[None], depths[None], H, W)
    warped = warp_ops.bilinear_sample(feats[1], px[0], py[0])
    direct = np.asarray(
        warp_ops.group_correlation(warped[None], feats[0][None])[0])
    rectv = np.asarray(epipolar.rectified_sweep_corr_jnp(
        feats[1], feats[0], rel, inv_lo, inv_step, nd))

    inner = (slice(None), slice(8, H - 8), slice(8, W - 8), slice(None))
    d_in, r_in = direct[inner], rectv[inner]
    assert np.corrcoef(d_in.ravel(), r_in.ravel())[0, 1] > 0.9
    am_d = d_in.sum(-1).argmax(0)
    am_r = r_in.sum(-1).argmax(0)
    agree = np.mean(np.abs(am_d - am_r) <= 1)
    assert agree > 0.9, f"argmax agreement {agree:.3f}"


def test_rectified_sweep_textured_plane_peaks_at_true_depth():
    """On a textured plane at known depth, the rectified sweep's
    correlation must peak at the true depth plane (the physics check)."""
    # baseline 120 mm at 600 mm depth: ~13 px of disparity sweep across
    # the hypothesis range (the default 12 mm would sweep ~1.3 px — no
    # depth discrimination at all on the smooth synthetic texture)
    imgs, cams, _ = synthetic.render_plane_views(H, W, 2, depth=600.0,
                                                 baseline=120.0)
    fused = geometry.fuse_projection(jnp.asarray(cams))
    rel = geometry.relative_projection(fused[1][None], fused[0][None])[0]
    # zero-mean the images: the raw DC component would dominate the
    # unnormalized group correlation and flatten the depth profile
    feat = jnp.asarray(imgs - imgs.mean((1, 2), keepdims=True))[..., :2]

    dmin, dmax = 450.0, 800.0
    nd = 24
    inv_lo = jnp.full((H, W), 1.0 / dmin)
    inv_step = jnp.full((H, W), (1.0 / dmax - 1.0 / dmin) / (nd - 1))
    vol = epipolar.rectified_sweep_corr_jnp(
        feat[1], feat[0], rel, inv_lo, inv_step, nd
    )
    prof = np.asarray(vol.sum(-1))[:, 10:H - 10, 10:W - 10].mean((1, 2))
    peak = prof.argmax()
    d_planes = 1.0 / (1.0 / dmin + np.arange(nd) * float(inv_step[0, 0]))
    plane_gap = abs(d_planes[peak] - d_planes[max(peak - 1, 0)])
    assert abs(d_planes[peak] - 600.0) < plane_gap * 1.5, (peak, d_planes[peak])
