"""Parity tests: jnp warp path vs torch grid_sample oracle."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dmvsnet_tpu.core import geometry
from dmvsnet_tpu.ops import warp
from tests.conftest import make_camera


def torch_grid_sample_pixels(img_hwc, px, py):
    """Oracle: grid_sample(align_corners=True, zeros) in pixel units."""
    h, w, c = img_hwc.shape
    xn = torch.from_numpy(px) / ((w - 1) / 2) - 1
    yn = torch.from_numpy(py) / ((h - 1) / 2) - 1
    grid = torch.stack([xn, yn], dim=-1)[None]  # (1, *, *, 2)
    t = torch.from_numpy(img_hwc).permute(2, 0, 1)[None]
    out = F.grid_sample(
        t, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    return out[0].permute(1, 2, 0).numpy()


def test_bilinear_sample_matches_grid_sample(rng):
    h, w, c = 13, 17, 4
    img = rng.normal(size=(h, w, c)).astype(np.float32)
    # coords spanning in-bounds, boundary and out-of-bounds
    px = rng.uniform(-3, w + 2, size=(9, 11)).astype(np.float32)
    py = rng.uniform(-3, h + 2, size=(9, 11)).astype(np.float32)
    ours = np.asarray(warp.bilinear_sample(jnp.asarray(img), jnp.asarray(px), jnp.asarray(py)))
    oracle = torch_grid_sample_pixels(img, px, py)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def torch_homo_warp(src_fea_nchw, src_proj, ref_proj, depth_values):
    """Independent torch oracle of homo_warping semantics (pixel math +
    grid_sample), following SURVEY.md §2.2 / reference networks/module.py:212-251."""
    b, c, h, w = src_fea_nchw.shape
    d = depth_values.shape[1]
    proj = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    yy, xx = torch.meshgrid(
        torch.arange(h, dtype=torch.float32), torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    xyz = torch.stack([xx.reshape(-1), yy.reshape(-1), torch.ones(h * w)])  # (3, HW)
    xyz = xyz[None].repeat(b, 1, 1)
    rot_xyz = torch.matmul(rot, xyz)
    rdx = rot_xyz.unsqueeze(2).repeat(1, 1, d, 1) * depth_values.view(b, 1, d, -1)
    proj_xyz = rdx + trans.view(b, 3, 1, 1)
    z = proj_xyz[:, 2:3]
    z = torch.where(z == 0, z + 1e-5, z)
    proj_xy = proj_xyz[:, :2] / z
    xn = proj_xy[:, 0] / ((w - 1) / 2) - 1
    yn = proj_xy[:, 1] / ((h - 1) / 2) - 1
    grid = torch.stack([xn, yn], dim=3)
    out = F.grid_sample(
        src_fea_nchw, grid.view(b, d * h, w, 2), mode="bilinear",
        padding_mode="zeros", align_corners=True,
    )
    return out.view(b, c, d, h, w)


def test_warp_src_feature_matches_torch_oracle(rng):
    b, h, w, c = 2, 12, 16, 8
    feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ref = np.stack([make_camera(rng, angle=0.0, t=[0, 0, 0])] * b)
    src = np.stack([make_camera(rng, angle=0.1, t=[0.4, 0.0, 0.1]),
                    make_camera(rng, angle=-0.08, t=[-0.3, 0.1, 0.0])])
    depth = rng.uniform(400, 900, size=(b, 5, h, w)).astype(np.float32)

    ours = np.asarray(
        warp.warp_src_feature(
            jnp.asarray(feat), jnp.asarray(src), jnp.asarray(ref), jnp.asarray(depth)
        )
    )  # (B, D, H, W, C)

    # torch oracle with manually fused projections
    def fuse(p2):
        f = p2[:, 0].copy()
        f[:, :3, :4] = np.einsum("bij,bjk->bik", p2[:, 1, :3, :3], p2[:, 0, :3, :4])
        return torch.from_numpy(f)

    oracle = torch_homo_warp(
        torch.from_numpy(feat).permute(0, 3, 1, 2),
        fuse(src), fuse(ref), torch.from_numpy(depth),
    ).numpy()  # (B, C, D, H, W)
    np.testing.assert_allclose(
        ours.transpose(0, 4, 1, 2, 3), oracle, atol=2e-4
    )


def test_plane_sweep_corr_cm_matches_reference(rng):
    """The channel-major fallback (pixels-on-lanes; used as the Pallas
    span-cond's XLA branch since the r4 364-GB train-compile OOM) must be
    BIT-identical to group_correlation(warp(src), ref) in forward and in
    both gradients."""
    import jax

    from dmvsnet_tpu.utils import synthetic

    h, w, c, d = 24, 160, 8, 4
    src = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2),
         synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2,
                                tx=-6.0, angle=0.01)]
    )
    fused = geometry.fuse_projection(jnp.asarray(cams[None]))[0]
    rel = geometry.relative_projection(fused[1], fused[0])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (d, h, w)).astype(np.float32), axis=0)
    )
    cot = jnp.asarray(rng.normal(size=(d, h, w, 2)).astype(np.float32))

    def ref_path(s, r):
        px, py = geometry.plane_sweep_coords(rel[None], dv[None], h, w)
        px = jax.lax.stop_gradient(px)
        py = jax.lax.stop_gradient(py)
        warped = jax.vmap(warp.bilinear_sample)(s[None], px, py)
        return warp.group_correlation(warped, r[None])[0]

    def cm_path(s, r):
        return jnp.transpose(
            warp.plane_sweep_corr_cm(s, r, rel, dv), (1, 2, 3, 0)
        )

    np.testing.assert_array_equal(
        np.asarray(cm_path(src, ref)), np.asarray(ref_path(src, ref))
    )
    g1 = jax.grad(lambda s, r: jnp.sum(ref_path(s, r) * cot), argnums=(0, 1))(src, ref)
    g2 = jax.grad(lambda s, r: jnp.sum(cm_path(s, r) * cot), argnums=(0, 1))(src, ref)
    for a, b, name in zip(g1, g2, ["src", "ref"]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"grad mismatch: {name}"
        )


def test_group_correlation_matches_reference_view_semantics(rng):
    b, d, h, w, c = 1, 3, 4, 5, 8
    warped = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    ref = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ours = np.asarray(warp.group_correlation(jnp.asarray(warped), jnp.asarray(ref)))
    # torch semantics: view(b, c//2, 2, d, h, w) on NCHW layout
    wt = torch.from_numpy(warped).permute(0, 4, 1, 2, 3)  # (B, C, D, H, W)
    rt = torch.from_numpy(ref).permute(0, 3, 1, 2).unsqueeze(2)  # (B, C, 1, H, W)
    sim = (wt.view(b, c // 2, 2, d, h, w) * rt.view(b, c // 2, 2, 1, h, w)).mean(1)
    np.testing.assert_allclose(ours.transpose(0, 4, 1, 2, 3), sim.numpy(), atol=1e-5)


def test_aggregate_cost_volume_sums_views(rng):
    b, h, w, c, v = 1, 8, 10, 8, 3
    feats = [rng.normal(size=(b, h, w, c)).astype(np.float32) for _ in range(v)]
    proj2 = np.stack(
        [make_camera(rng, angle=0.05 * i, t=[0.1 * i, 0, 0]) for i in range(v)]
    )[None]
    depth = rng.uniform(400, 900, size=(b, 4, h, w)).astype(np.float32)
    total = np.asarray(
        warp.aggregate_cost_volume(
            [jnp.asarray(f) for f in feats], jnp.asarray(proj2), jnp.asarray(depth)
        )
    )
    manual = 0
    for i in range(1, v):
        wv = warp.warp_src_feature(
            jnp.asarray(feats[i]), jnp.asarray(proj2[:, i]), jnp.asarray(proj2[:, 0]),
            jnp.asarray(depth),
        )
        manual = manual + np.asarray(warp.group_correlation(wv, jnp.asarray(feats[0])))
    np.testing.assert_allclose(total, manual, atol=1e-5)
