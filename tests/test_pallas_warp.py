"""Pallas fused warp+correlation kernel vs the XLA reference path
(interpret mode — runs on CPU; the compiled path is exercised on real
TPU hardware by the bench/driver)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmvsnet_tpu.ops import warp as W
from dmvsnet_tpu.ops.pallas.warp_correlate import (
    aggregate_cost_volume_pallas,
    plane_sweep_corr_view,
)
from dmvsnet_tpu.utils import synthetic


@pytest.mark.parametrize("channels", [8, 32])
def test_pallas_corr_matches_xla(rng, channels):
    b, h, w, d = 1, 32, 256, 4
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, channels)).astype(np.float32))
        for _ in range(3)
    ]
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2,
                                tx=-8.0 * i, angle=0.01 * i) for i in range(3)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (b, d, h, w)).astype(np.float32), axis=1)
    )
    ref = np.asarray(W.aggregate_cost_volume(feats, proj2, dv))
    pal = np.asarray(aggregate_cost_volume_pallas(feats, proj2, dv, interpret=True))
    np.testing.assert_allclose(pal, ref, atol=2e-4)


def test_pallas_zero_padding_semantics(rng):
    """Views that project partially outside the source must match the
    XLA path's zero padding exactly."""
    b, h, w, c, d = 1, 32, 256, 8, 2
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for _ in range(2)
    ]
    # big translation: much of the warp lands outside the source image
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2),
         synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2, tx=-120.0)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(300, 500, (b, d, h, w)).astype(np.float32), axis=1)
    )
    ref = np.asarray(W.aggregate_cost_volume(feats, proj2, dv))
    pal = np.asarray(aggregate_cost_volume_pallas(feats, proj2, dv, interpret=True))
    np.testing.assert_allclose(pal, ref, atol=2e-4)


def test_pallas_padded_sizes(rng):
    """Non-tile-aligned H/W exercise the padded-pixel window logic (a
    low pad value once dragged windows off the real pixels)."""
    b, h, w, c, d = 1, 24, 160, 8, 2
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for _ in range(2)
    ]
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2),
         synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2, tx=-10.0)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (b, d, h, w)).astype(np.float32), axis=1)
    )
    ref = np.asarray(W.aggregate_cost_volume(feats, proj2, dv))
    pal = np.asarray(aggregate_cost_volume_pallas(feats, proj2, dv, interpret=True))
    np.testing.assert_allclose(pal, ref, atol=2e-4)


def test_pallas_gradient_matches_xla(rng):
    """Custom VJP (adjoint Pallas kernels) vs autodiff of the XLA gather
    path: gradients wrt source and reference features must agree; proj /
    depth hypotheses must get ZERO gradient (stop-gradient grid)."""
    import jax

    b, h, w, c, d = 1, 24, 160, 8, 4
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for _ in range(3)
    ]
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2,
                                tx=-6.0 * i, angle=0.012 * i) for i in range(3)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (b, d, h, w)).astype(np.float32), axis=1)
    )
    # a non-trivial scalar so cotangents vary over (d, pixel, group)
    cot_w = jnp.asarray(rng.normal(size=(b, d, h, w, 2)).astype(np.float32))

    def loss_pallas(f0, f1, f2, dv):
        out = aggregate_cost_volume_pallas([f0, f1, f2], proj2, dv,
                                           interpret=True)
        return jnp.sum(out * cot_w)

    def loss_xla(f0, f1, f2, dv):
        return jnp.sum(W.aggregate_cost_volume([f0, f1, f2], proj2, dv) * cot_w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*feats, dv)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*feats, dv)
    for ours, ref, name in zip(gp, gx, ["ref", "src1", "src2", "dv"]):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )
    np.testing.assert_array_equal(np.asarray(gp[3]), 0.0)


def test_pallas_gradient_matches_xla_c32_fast12(rng):
    """Gradient parity at c=32 with narrow geometry: this takes the
    MIN_ROWS_FAST=12 branch, whose backward kernels must be built with
    the SAME row tier as their scratch buffers (a default-tier
    _make_grad_ref_kernel DMA'd q=5 row-blocks into a q=4 scratch —
    Mosaic 'enqueue_dma shape mismatch' on hardware, round-3 chiprun)."""
    import jax

    from dmvsnet_tpu.ops.pallas import warp_correlate as wc

    b, h, w, c, d = 1, 24, 160, 32, 4
    # sanity: c=32 must actually tier (q_fast12 < q_default)
    assert wc._row_group(c, wc.MIN_ROWS_FAST)[1] < wc._row_group(c)[1]
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for _ in range(2)
    ]
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2),
         synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2,
                                tx=-4.0, angle=0.008)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (b, d, h, w)).astype(np.float32), axis=1)
    )
    # the fast12 branch must actually be TAKEN for this geometry — if the
    # span check failed, lax.cond would route elsewhere and this test
    # would silently stop covering the fixed kernel (ADVICE r3)
    from dmvsnet_tpu.core import geometry as G

    fused = G.fuse_projection(proj2)[0]
    rel = G.relative_projection(fused[1], fused[0])
    assert bool(
        wc._span_ok(rel, dv[0], h, w, c, wc.C_WIN_FAST, wc.MIN_ROWS_FAST)
    ), "smoke geometry no longer selects the fast12 tier"
    cot_w = jnp.asarray(rng.normal(size=(b, d, h, w, 2)).astype(np.float32))

    def loss_pallas(f0, f1):
        out = aggregate_cost_volume_pallas([f0, f1], proj2, dv,
                                           interpret=True)
        return jnp.sum(out * cot_w)

    def loss_xla(f0, f1):
        return jnp.sum(W.aggregate_cost_volume([f0, f1], proj2, dv) * cot_w)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(*feats)
    gx = jax.grad(loss_xla, argnums=(0, 1))(*feats)
    for ours, ref, name in zip(gp, gx, ["ref", "src1"]):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_wide_baseline_falls_back_and_matches_xla(rng):
    """T&T-like adversarial geometry (strong rotation + wide baseline):
    per-tile projected spans exceed the kernel windows, the span check
    must detect it, and the cond fallback must keep the output EXACT vs
    the XLA path (no silent zeros)."""
    from dmvsnet_tpu.core import geometry
    from dmvsnet_tpu.ops.pallas import warp_correlate as wc

    b, h, w, c, d = 1, 32, 768, 8, 4
    feats = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for _ in range(2)
    ]
    # 3x focal-ratio pair (strong zoom): dpx/dx = 3, so a 128-lane tile's
    # in-image projected span is ~384 columns >= C_WIN coverage
    cams = np.stack(
        [synthetic.camera_stack(300.0, 300.0, w / 2, h / 2),
         synthetic.camera_stack(900.0, 900.0, w / 2, h / 2, tx=-2.0)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(120, 900, (b, d, h, w)).astype(np.float32), axis=1)
    )
    fused = geometry.fuse_projection(proj2)
    rel = geometry.relative_projection(fused[0, 1], fused[0, 0])
    ok = bool(wc._span_ok(rel, dv[0], h, w, c))
    assert not ok, "adversarial geometry should violate the kernel spans"

    ref = np.asarray(W.aggregate_cost_volume(feats, proj2, dv))
    pal = np.asarray(aggregate_cost_volume_pallas(feats, proj2, dv, interpret=True))
    # 2e-4: same class as the kernel-path tests — the fallback re-derives
    # the relative projection (batched vs unbatched inv differ by ~1 ulp,
    # amplified 3x by the zoom); the property under test is NO silent
    # zeros, i.e. agreement at fp tolerance rather than O(1) loss.
    np.testing.assert_allclose(pal, ref, atol=2e-4)

    # benign geometry must stay on the kernel path
    cams_ok = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2),
         synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2, tx=-8.0)]
    )
    fused_ok = geometry.fuse_projection(jnp.asarray(cams_ok[None]))
    rel_ok = geometry.relative_projection(fused_ok[0, 1], fused_ok[0, 0])
    dv_ok = jnp.asarray(
        np.sort(rng.uniform(400, 700, (b, d, h, w)).astype(np.float32), axis=1)
    )
    assert bool(wc._span_ok(rel_ok, dv_ok[0], h, w, c))


def test_pallas_bf16_inputs_upcast_and_grad(rng):
    """bf16 training inputs (mixed-precision model dtype) must route
    through the fp32-typed kernel without a DMA element-type mismatch:
    the entry upcasts, the result is fp32, and the gradient comes back
    in the caller's bf16 dtype (chip repro: 'tpu.enqueue_dma' op DMA
    source and target element type mismatch, CHIPRUN5.log r5)."""
    import jax

    b, h, w, c, d = 1, 24, 160, 8, 4
    feats32 = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for _ in range(3)
    ]
    feats = [f.astype(jnp.bfloat16) for f in feats32]
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2,
                                tx=-6.0 * i, angle=0.012 * i) for i in range(3)]
    )
    proj2 = jnp.asarray(cams[None])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (b, d, h, w)).astype(np.float32), axis=1)
    )
    out = aggregate_cost_volume_pallas(feats, proj2, dv, interpret=True)
    assert out.dtype == jnp.float32
    ref = np.asarray(
        W.aggregate_cost_volume([f.astype(jnp.float32) for f in feats],
                                proj2, dv)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def loss(f0, f1, f2):
        o = aggregate_cost_volume_pallas([f0, f1, f2], proj2, dv,
                                         interpret=True)
        return jnp.sum(o)

    g = jax.grad(loss, argnums=(0, 1, 2))(*feats)
    for gi in g:
        assert gi.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(gi.astype(jnp.float32))))
