"""Pallas epipolar 1-D sweep kernels vs the jnp reference (interpret
mode — CPU; the compiled path is exercised on real TPU by the bench).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvsnet_tpu.core import epipolar, geometry
from dmvsnet_tpu.ops import warp as warp_ops
from dmvsnet_tpu.ops.pallas import warp_correlate
from dmvsnet_tpu.ops.pallas.epipolar_sweep import (
    aggregate_cost_volume_epipolar,
    epipolar_corr_view,
    resample_tiled,
)
from dmvsnet_tpu.utils import synthetic

H, W = 32, 64


def _smooth(a, k=3):
    for _ in range(k):
        a = 0.25 * (np.roll(a, 1, 0) + np.roll(a, -1, 0)
                    + np.roll(a, 1, 1) + np.roll(a, -1, 1))
    return a


def _feats(c, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(_smooth(rng.normal(size=(H, W, c))).astype(np.float32))
            for _ in range(n)]


def _cams(angle=0.0, baseline=80.0):
    cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2,
                               tx=-baseline, angle=angle),
    ])
    fused = geometry.fuse_projection(jnp.asarray(cams))
    return geometry.relative_projection(fused[1][None], fused[0][None])[0]


def _inv_fan(dpl, dmin=450.0, dmax=800.0):
    inv_lo = jnp.full((H, W), 1.0 / dmin)
    inv_step = jnp.full((H, W), (1.0 / dmax - 1.0 / dmin) / (dpl - 1))
    ds = jnp.arange(dpl, dtype=jnp.float32)
    depths = 1.0 / (inv_lo[None] + ds[:, None, None] * inv_step[None])
    return inv_lo, inv_step, depths


def test_resample_kernel_matches_bilinear():
    """The generic resample kernel == ops.warp.bilinear_sample, incl.
    zero padding, on an arbitrary smooth homography warp."""
    (img,) = _feats(16, n=1)
    rel = _cams(angle=0.07)
    rect = epipolar.compute_rectification(rel, H, W)
    px, py = epipolar.rect_grid_coords(rect.h_src, H, W)
    want = warp_ops.bilinear_sample(img, px, py)
    got = resample_tiled(img, px, py, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,dpl", [(16, 8), (32, 8)])
def test_epipolar_view_matches_jnp_reference(c, dpl):
    """Kernel pipeline == the pure-jnp rectified sweep (same algorithm:
    rectify, 1-D lerp, correlate, un-rectify) for a rotated pair."""
    feats = _feats(c)
    rel = _cams(angle=0.05)
    inv_lo, inv_step, depths = _inv_fan(dpl)

    want = epipolar.rectified_sweep_corr_jnp(
        feats[1], feats[0], rel, inv_lo, inv_step, dpl
    )
    ref_t = warp_correlate._tile_ref(feats[0])
    got = epipolar_corr_view(
        feats[1], feats[0], ref_t, rel, depths, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_epipolar_exact_for_pure_translation():
    """Pure translation: the epipolar aggregation == the 2-D kernel
    aggregation == the XLA path, exactly."""
    feats = [f[None] for f in _feats(16, n=3)]
    cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2,
                               tx=-80.0 * i) for i in range(3)
    ])
    proj2 = jnp.asarray(cams)[None]
    _, _, depths = _inv_fan(8)
    dv = depths[None]

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv)
    got = aggregate_cost_volume_epipolar(feats, proj2, dv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_epipolar_falls_back_on_adversarial_geometry():
    """Epipole inside the image (forward motion): validity gating must
    route to the 2-D kernel path and match the XLA result exactly."""
    feats = [f[None] for f in _feats(16, n=2)]
    cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
    ])
    cams[1, 0, :3, 3] = [0.5, 0.3, -40.0]  # mostly-forward motion
    proj2 = jnp.asarray(cams)[None]
    _, _, depths = _inv_fan(8)
    dv = depths[None]

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv)
    got = aggregate_cost_volume_epipolar(feats, proj2, dv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_epipolar_c8_engages_and_is_exact_for_translation():
    """c=8 (G=16 > BR=8): the offset row-mask packing (stage-3 feature
    width) ENGAGES the 1-D sweep; for a pure-translation pair the
    rectification is the identity so the result must equal the XLA path
    exactly."""
    from dmvsnet_tpu.ops.pallas.epipolar_sweep import sweep_engaged

    feats = [f[None] for f in _feats(8, n=2)]
    rel_cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2, tx=-80.0),
    ])
    proj2 = jnp.asarray(rel_cams)[None]
    _, _, depths = _inv_fan(8)
    dv = depths[None]

    fused = geometry.fuse_projection(proj2)
    rel = geometry.relative_projection(fused[0, 1], fused[0, 0])
    assert sweep_engaged(rel, depths, H, W, 8)

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv)
    got = aggregate_cost_volume_epipolar(feats, proj2, dv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_epipolar_c8_rotated_matches_jnp_reference():
    """c=8 under rotation: the g>BR kernel packing == the pure-jnp
    rectified sweep (same rectify / 1-D lerp / correlate / un-rectify
    algorithm)."""
    feats = _feats(8)
    rel = _cams(angle=0.05)
    inv_lo, inv_step, depths = _inv_fan(8)

    want = epipolar.rectified_sweep_corr_jnp(
        feats[1], feats[0], rel, inv_lo, inv_step, 8
    )
    ref_t = warp_correlate._tile_ref(feats[0])
    got = epipolar_corr_view(
        feats[1], feats[0], ref_t, rel, depths, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_epipolar_refine_fan_engages_and_is_exact_for_translation():
    """4-plane refine fans are arithmetic in DEPTH (every stack6 slice in
    depth_net has step mx-mn): the depth-affine fan mode must engage the
    sweep and, for pure translation (identity rectification), match the
    XLA path exactly."""
    from dmvsnet_tpu.ops.pallas.epipolar_sweep import sweep_engaged

    feats = [f[None] for f in _feats(16, n=2)]
    cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2, tx=-80.0),
    ])
    proj2 = jnp.asarray(cams)[None]
    # per-pixel arithmetic-in-depth 4-plane fan with a varying interval
    # (the refine checkerboard's structure)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    mid = 600.0 + 40.0 * np.sin(gx / 17.0) * np.cos(gy / 13.0)
    step = 6.0 + 2.0 * ((gx + gy) % 2)  # oscillating interval
    ds = np.arange(4, dtype=np.float32) - 1.5
    dv = jnp.asarray(
        (mid[None] + ds[:, None, None] * step[None]).astype(np.float32)
    )

    fused = geometry.fuse_projection(proj2)
    rel = geometry.relative_projection(fused[0, 1], fused[0, 0])
    assert sweep_engaged(rel, dv, H, W, 16)

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv[None])
    got = aggregate_cost_volume_epipolar(feats, proj2, dv[None],
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_epipolar_unchunkable_depth_count_falls_back():
    """dpl=5 (folded channels 10: not decomposable into 64/32/16/8
    chunks): must route to the 2-D kernel and match XLA exactly."""
    feats = [f[None] for f in _feats(16, n=2)]
    rel_cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2,
                               tx=-80.0, angle=0.05),
    ])
    proj2 = jnp.asarray(rel_cams)[None]
    _, _, depths = _inv_fan(5)
    dv = depths[None]

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv)
    got = aggregate_cost_volume_epipolar(feats, proj2, dv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_full_model_epipolar_depth_close_to_exact():
    """THE accuracy gate for the approximation: the full cascade with
    use_epipolar_warp on a textured synthetic scene must produce depth
    maps within a fraction of the stage-3 interval of the exact path
    (checkerboard blending and the extra resamples included)."""
    import dmvsnet_tpu.ops.pallas.epipolar_sweep as es
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.utils import synthetic as syn

    h, w, v = 64, 96, 3
    imgs, cams, _ = syn.render_plane_views(h, w, v, depth=600.0,
                                           baseline=100.0)
    proj = {k: jnp.asarray(np.broadcast_to(p, (1, *p.shape)).copy())
            for k, p in syn.stage_projections(cams).items()}
    imgs_j = jnp.asarray(imgs)[None]
    dv = jnp.asarray(np.linspace(425.0, 935.0, 48, dtype=np.float32))[None]

    exact = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1),
                   inverse_depth=True)
    variables = exact.init(jax.random.PRNGKey(0), imgs_j, proj, dv)
    out_exact = exact.apply(variables, imgs_j, proj, dv, train=False)

    epi = MVSNet(ndepths=(8, 8, 8), depth_interval_ratio=(4, 2, 1),
                 inverse_depth=True, use_epipolar_warp=True)
    old = es.INTERPRET
    es.INTERPRET = True
    try:
        out_epi = epi.apply(variables, imgs_j, proj, dv, train=False)
    finally:
        es.INTERPRET = old

    d_e = np.asarray(out_exact["depth"])[0]
    d_a = np.asarray(out_epi["depth"])[0]
    inner = (slice(8, h - 8), slice(12, w - 12))
    diff = np.abs(d_e[inner] - d_a[inner])
    # stage-3 interval here = (935-425)/48 ~ 10.6 mm
    assert np.mean(diff) < 2.0, float(np.mean(diff))
    assert np.percentile(diff, 95) < 8.0, float(np.percentile(diff, 95))


def test_epipolar_per_pixel_cascade_fans_pure_translation_exact():
    """Per-pixel checkerboarded cascade hypotheses (the real stage-2
    input): for a pure-translation pair the rectification is the
    identity, so the epipolar path must be EXACT even with per-pixel
    inverse fans."""
    from dmvsnet_tpu.core import sampling

    feats = [f[None] for f in _feats(16, n=2)]
    cams = np.stack([
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2),
        synthetic.camera_stack(1.2 * W, 1.2 * W, W / 2, H / 2, tx=-80.0),
    ])
    proj2 = jnp.asarray(cams)[None]
    # smooth per-pixel previous-depth map -> checkerboarded inverse fans
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    last = 600.0 + 40.0 * np.sin(gx / 17.0) * np.cos(gy / 13.0)
    dv, _ = sampling.cascade_samples(
        jnp.asarray(last, jnp.float32)[None], 8, jnp.float32(5.0),
        inverse=True,
    )

    want = warp_ops.aggregate_cost_volume(feats, proj2, dv)
    got = aggregate_cost_volume_epipolar(feats, proj2, dv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
