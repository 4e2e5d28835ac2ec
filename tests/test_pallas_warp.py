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
