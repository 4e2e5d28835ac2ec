"""Camera / plane-sweep geometry, pure jnp.

The reference stores per-view cameras as a (2, 4, 4) stack
[extrinsics(4x4); intrinsics(3x3 padded)] and fuses them on the fly
(reference networks/mvsnet.py:133-136).  Here the fusion, the relative
homography and the pixel-grid lift are standalone closed-form functions
so they can be tested by property (project∘backproject == id) and reused
by both the network warp and the point-cloud fusion stage.

Conventions
-----------
* ``proj2`` denotes the (..., 2, 4, 4) stacked camera.
* ``fused`` denotes the single (..., 4, 4) matrix  [[K R | K t], [0 | 1]].
* Pixel coordinates are (x, y) with x along width, matching the
  reference's meshgrid convention (reference networks/module.py:227-231).
* All math is float32: sub-millimetre depth precision at DTU scale
  (~400-900 mm) does not survive bfloat16.  That is NOT automatic on
  TPU: XLA lowers float32 dot/einsum at ``Precision.DEFAULT`` to bf16
  MXU passes, which put ~0.2% relative error on every projection matrix
  and every warp coordinate (measured: a constant 0.25-row shift in the
  rectification at H=96 — invisible to A/B gates because both comparands
  shared it; caught by the interpret-vs-compiled bisect, round 5).  All
  contractions here therefore pin ``Precision.HIGHEST``, and 3x3
  inverses use the closed-form adjugate (pure VPU arithmetic) instead of
  LU.  These are tiny matrices — the cost is nil.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# exact fp32 for all geometry contractions (see module docstring)
PRECISION = jax.lax.Precision.HIGHEST


def inv3(a: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det) — batched over leading
    dims, pure elementwise arithmetic (no MXU, exact fp32)."""
    m = a
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02)
    c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def fuse_projection(proj2: jnp.ndarray) -> jnp.ndarray:
    """Fold intrinsics into extrinsics: rows :3 become K[:3,:3] @ E[:3,:4].

    Mirrors reference networks/mvsnet.py:133-136 (done there per source
    view inside the cost-aggregation loop; here it is a one-shot batched
    transform).

    Args:
      proj2: (..., 2, 4, 4) — [0] extrinsics (4x4), [1] intrinsics in the
        top-left 3x3 block.

    Returns:
      (..., 4, 4) fused projection; bottom row kept from the extrinsics
      (i.e. [0, 0, 0, 1]).
    """
    ext = proj2[..., 0, :, :]
    intr = proj2[..., 1, :3, :3]
    top = jnp.einsum("...ij,...jk->...ik", intr, ext[..., :3, :4],
                     precision=PRECISION)
    return jnp.concatenate([top, ext[..., 3:4, :]], axis=-2)


def invert_fused(fused: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a fused projection [[A, b], [0, 1]].

    inv = [[A^-1, -A^-1 b], [0, 1]].  A is K@R (invertible for a real
    camera).  Avoids a generic 4x4 LU for numerical robustness.
    """
    a = fused[..., :3, :3]
    b = fused[..., :3, 3:4]
    a_inv = inv3(a)
    top = jnp.concatenate(
        [a_inv, -jnp.einsum("...ij,...jk->...ik", a_inv, b,
                            precision=PRECISION)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], fused.dtype), fused[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def relative_projection(src_fused: jnp.ndarray, ref_fused: jnp.ndarray) -> jnp.ndarray:
    """src @ inv(ref): maps ref-camera homogeneous coords to src pixels.

    Equivalent to ``torch.matmul(src_proj, torch.inverse(ref_proj))``
    (reference networks/module.py:223).
    """
    return jnp.einsum("...ij,...jk->...ik", src_fused, invert_fused(ref_fused),
                      precision=PRECISION)


def plane_sweep_coords(
    rel_proj: jnp.ndarray, depth_values: jnp.ndarray, height: int, width: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Source-view pixel coordinates of every (ref pixel, depth plane).

    For ref pixel (x, y) at hypothesis depth d:
      p = R' (x, y, 1)^T * d + t'   with  R' = rel[:3,:3], t' = rel[:3,3]
      (px, py) = (p0/p2, p1/p2)
    A z==0 guard adds 1e-5 exactly like the reference's "NAN BUG" fix
    (reference networks/module.py:237).

    Args:
      rel_proj: (B, 4, 4) relative fused projection.
      depth_values: (B, D) per-image planes or (B, D, H, W) per-pixel.
      height, width: ref image size (static).

    Returns:
      (px, py): each (B, D, H, W) source-view pixel coordinates (un-normalized).
    """
    b = rel_proj.shape[0]
    d = depth_values.shape[1]
    rot = rel_proj[:, :3, :3]
    trans = rel_proj[:, :3, 3]

    y = jnp.arange(height, dtype=jnp.float32)
    x = jnp.arange(width, dtype=jnp.float32)
    # (3, H, W): homogeneous pixel rays
    ones = jnp.ones((height, width), jnp.float32)
    xyz = jnp.stack([jnp.tile(x, (height, 1)), jnp.tile(y[:, None], (1, width)), ones])

    # rot_xyz: (B, 3, H, W)
    rot_xyz = jnp.einsum("bij,jhw->bihw", rot, xyz, precision=PRECISION)
    depth = jnp.broadcast_to(
        depth_values.reshape(b, d, 1, 1) if depth_values.ndim == 2 else depth_values,
        (b, d, height, width),
    )
    # (B, 3, D, H, W)
    p = rot_xyz[:, :, None, :, :] * depth[:, None] + trans[:, :, None, None, None]
    z = p[:, 2]
    z = jnp.where(z == 0.0, z + 1e-5, z)
    px = p[:, 0] / z
    py = p[:, 1] / z
    return px, py


def reproject_pixels(
    fused_dst: jnp.ndarray, fused_src: jnp.ndarray, depth_src: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lift every src pixel by its depth and project into dst camera.

    The primitive behind the fusion-stage geometric-consistency round
    trip (reference filter/pcd.py:152-200).  Works on fused matrices so
    the same code path serves network-resolution and full-resolution
    cameras.

    Args:
      fused_dst, fused_src: (4, 4) fused projections.
      depth_src: (H, W) per-pixel depth in the src camera.

    Returns:
      (x_dst, y_dst, z_dst): each (H, W) — projected pixel coords and the
      depth of the lifted point in the dst camera frame.
    """
    h, w = depth_src.shape
    rel = relative_projection(fused_dst[None], fused_src[None])
    px, py = plane_sweep_coords(rel, depth_src[None, None], h, w)
    # plane_sweep_coords divides by z; recover z for the depth output.
    rot = rel[0, :3, :3]
    trans = rel[0, :3, 3]
    y = jnp.arange(h, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    ones = jnp.ones((h, w), jnp.float32)
    xyz = jnp.stack([jnp.tile(x, (h, 1)), jnp.tile(y[:, None], (1, w)), ones])
    p = (jnp.einsum("ij,jhw->ihw", rot, xyz, precision=PRECISION)
         * depth_src[None] + trans[:, None, None])
    return px[0, 0], py[0, 0], p[2]


def backproject_to_world(
    intrinsics: jnp.ndarray, extrinsics: jnp.ndarray, x: jnp.ndarray,
    y: jnp.ndarray, depth: jnp.ndarray
) -> jnp.ndarray:
    """Pixel (x, y, depth) -> world XYZ (reference filter/pcd.py:340-343).

    Args:
      intrinsics: (3, 3); extrinsics: (4, 4) world->camera.
      x, y, depth: (N,) flat pixel coordinates and depths.

    Returns:
      (N, 3) world-space points.
    """
    uv1 = jnp.stack([x, y, jnp.ones_like(x)])  # (3, N)
    cam = jnp.matmul(inv3(intrinsics), uv1 * depth[None], precision=PRECISION)
    cam_h = jnp.concatenate([cam, jnp.ones_like(cam[:1])], axis=0)
    world = jnp.matmul(jnp.linalg.inv(extrinsics), cam_h, precision=PRECISION)
    return world[:3].T
