"""Property tests for dmvsnet_tpu.core.geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmvsnet_tpu.core import geometry
from tests.conftest import make_camera


def test_fuse_projection_matches_manual(rng):
    proj2 = np.stack([make_camera(rng, angle=0.2), make_camera(rng, angle=-0.1)])
    fused = np.asarray(geometry.fuse_projection(jnp.asarray(proj2)))
    for i in range(2):
        expect = proj2[i, 0].copy()
        expect[:3, :4] = proj2[i, 1, :3, :3] @ proj2[i, 0, :3, :4]
        np.testing.assert_allclose(fused[i], expect, rtol=1e-6)


def test_invert_fused_is_inverse(rng):
    fused = geometry.fuse_projection(jnp.asarray(make_camera(rng)[None]))
    inv = geometry.invert_fused(fused)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bjk->bik", fused, inv))[0],
        np.eye(4),
        atol=1e-4,
    )


def test_identity_relative_projection_warps_to_self(rng):
    """src == ref camera => plane-sweep coords are the pixel grid itself."""
    cam = make_camera(rng)[None]
    fused = geometry.fuse_projection(jnp.asarray(cam))
    rel = geometry.relative_projection(fused, fused)
    h, w = 12, 16
    depth = jnp.full((1, 3), 500.0) + jnp.arange(3) * 50.0
    px, py = geometry.plane_sweep_coords(rel, depth, h, w)
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    for d in range(3):
        np.testing.assert_allclose(np.asarray(px)[0, d], gx, atol=1e-2)
        np.testing.assert_allclose(np.asarray(py)[0, d], gy, atol=1e-2)


def test_plane_sweep_matches_explicit_projection(rng):
    """Lift a pixel by depth in ref frame, project with src K[R|t] directly."""
    ref = make_camera(rng, angle=0.0, t=[0, 0, 0])
    src = make_camera(rng, angle=0.15, t=[0.3, -0.1, 0.05])
    fused_r = geometry.fuse_projection(jnp.asarray(ref[None]))
    fused_s = geometry.fuse_projection(jnp.asarray(src[None]))
    rel = geometry.relative_projection(fused_s, fused_r)
    h, w = 8, 10
    depth = jnp.full((1, 1, h, w), 600.0)
    px, py = geometry.plane_sweep_coords(rel, depth, h, w)

    # explicit: ref cam at origin => pixel (x,y,d) -> cam point K^-1*(x,y,1)*d
    K = ref[1, :3, :3]
    x, y = 7.0, 3.0
    p_cam = np.linalg.inv(K) @ np.array([x, y, 1.0]) * 600.0
    p_src = src[0, :3, :3] @ p_cam + src[0, :3, 3]
    uv = src[1, :3, :3] @ p_src
    np.testing.assert_allclose(np.asarray(px)[0, 0, 3, 7], uv[0] / uv[2], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(py)[0, 0, 3, 7], uv[1] / uv[2], rtol=1e-4)


def test_reproject_round_trip_identity(rng):
    """dst == src camera: reprojection returns the original pixels/depth."""
    cam = make_camera(rng)
    fused = geometry.fuse_projection(jnp.asarray(cam[None]))[0]
    depth = jnp.asarray(500.0 + np.abs(rng.normal(size=(6, 9)).astype(np.float32)) * 50)
    x, y, z = geometry.reproject_pixels(fused, fused, depth)
    gx, gy = np.meshgrid(np.arange(9, dtype=np.float32), np.arange(6, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(x), gx, atol=1e-2)
    np.testing.assert_allclose(np.asarray(y), gy, atol=1e-2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), rtol=1e-5)


def test_backproject_project_round_trip(rng):
    cam = make_camera(rng, angle=0.3, t=[0.5, 0.2, -0.1])
    intr = jnp.asarray(cam[1, :3, :3])
    ext = jnp.asarray(cam[0])
    x = jnp.asarray(rng.uniform(0, 100, 20).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 80, 20).astype(np.float32))
    d = jnp.asarray(rng.uniform(400, 900, 20).astype(np.float32))
    world = geometry.backproject_to_world(intr, ext, x, y, d)
    # project back: K (E @ world_h)
    wh = jnp.concatenate([world, jnp.ones((20, 1))], axis=1)
    camp = (ext @ wh.T)[:3]
    uv = intr @ camp
    np.testing.assert_allclose(np.asarray(uv[0] / uv[2]), np.asarray(x), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(uv[1] / uv[2]), np.asarray(y), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(camp[2]), np.asarray(d), rtol=1e-4)
