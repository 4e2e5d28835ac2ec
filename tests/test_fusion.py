"""Fusion tests: PLY IO, reprojection identity, end-to-end pcd/dypcd on a
synthetic consistent scene."""

import os

import numpy as np
import pytest
from PIL import Image

from dmvsnet_tpu.data import io
from dmvsnet_tpu.fusion import geometry_np as G
from dmvsnet_tpu.fusion.pcd import pcd_filter
from dmvsnet_tpu.fusion.dypcd import dypcd_filter
from dmvsnet_tpu.fusion.ply import read_ply, write_ply
from dmvsnet_tpu.utils import synthetic

DEPTH = 600.0
H, W, V = 96, 128, 4


def test_ply_round_trip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(100, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ply")
    write_ply(p, xyz, rgb)
    x2, r2 = read_ply(p)
    np.testing.assert_array_equal(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)


def test_reprojection_identity(rng):
    intr = np.array([[150.0, 0, 64], [0, 150.0, 48], [0, 0, 1]], np.float32)
    extr = np.eye(4, dtype=np.float32)
    depth = np.full((H, W), DEPTH, np.float32)
    mask, depth_rep = G.check_geometric_consistency(
        depth, intr, extr, depth, intr, extr
    )
    assert mask.all()
    np.testing.assert_allclose(depth_rep, depth, rtol=1e-4)


def _write_outputs_tree(root):
    """Test-runner-format outputs for a consistent plane scene: every
    view's depth map is exactly the plane, confidences high."""
    imgs, cams, _ = synthetic.render_plane_views(H, W, V, DEPTH, seed=3)
    datapath = os.path.join(root, "data")
    outdir = os.path.join(root, "out")
    scan = "scan7"
    pairs = []
    for v in range(V):
        os.makedirs(os.path.join(outdir, scan, "images"), exist_ok=True)
        Image.fromarray((imgs[v] * 255).astype(np.uint8)).save(
            os.path.join(outdir, scan, "images", f"{v:08d}.jpg"), quality=97
        )
        io.write_cam_file(
            os.path.join(outdir, scan, "cams", f"{v:08d}_cam.txt"), cams[v]
        )
        io.save_pfm(
            os.path.join(outdir, scan, "depth_est", f"{v:08d}.pfm"),
            np.full((H, W), DEPTH, np.float32),
        )
        io.save_pfm(
            os.path.join(outdir, scan, "confidence", f"{v:08d}.pfm"),
            np.full((H, W), 0.99, np.float32),
        )
        pairs.append((v, [s for s in range(V) if s != v]))
    io.write_pair_file(os.path.join(datapath, scan, "pair.txt"), pairs)
    return datapath, outdir, scan


def test_pcd_filter_end_to_end(tmp_path):
    datapath, outdir, scan = _write_outputs_tree(str(tmp_path))
    args = {"datapath": datapath, "outdir": outdir, "conf": (0.0, 0.0, 0.3),
            "thres_view": 3, "num_stage": 3}
    pcd_filter(args, [scan], num_workers=1)

    ply_path = os.path.join(outdir, "pcd", "mvsnet007_l3.ply")
    xyz, rgb = read_ply(ply_path)
    assert len(xyz) > 0.8 * V * H * W  # nearly every pixel consistent
    # all points lie on the z=600 plane in world (= ref camera) frame
    np.testing.assert_allclose(xyz[:, 2], DEPTH, atol=0.5)
    # masks written
    assert os.path.exists(os.path.join(outdir, scan, "mask/00000000_final.png"))


def test_dypcd_filter_end_to_end_and_cache(tmp_path):
    datapath, outdir, scan2 = _write_outputs_tree(str(tmp_path))
    args = {"datapath": datapath, "outdir": outdir, "conf": (0.0, 0.0, 0.3),
            "dist_base": 0.25, "rel_diff_base": 1 / 1300, "num_stage": 3}
    dypcd_filter(args, [scan2], num_workers=1)
    ply_path = os.path.join(outdir, "pcd", "mvsnet007_l3.ply")
    xyz, _ = read_ply(ply_path)
    np.testing.assert_allclose(xyz[:, 2], DEPTH, atol=0.5)
    # per-view cache written; a second run consumes it (and must not crash)
    avg = os.path.join(outdir, scan2, "depth_est", "00000000_averaged.pfm")
    assert os.path.exists(avg)
    dypcd_filter(args, [scan2], num_workers=1)


def test_inconsistent_depths_are_rejected(tmp_path):
    datapath, outdir, scan = _write_outputs_tree(str(tmp_path))
    # corrupt half of every source view's depth
    for v in range(1, V):
        p = os.path.join(outdir, scan, "depth_est", f"{v:08d}.pfm")
        d = io.read_pfm(p)[0]
        d[:, W // 2 :] *= 1.25
        io.save_pfm(p, d.astype(np.float32))
    args = {"datapath": datapath, "outdir": outdir, "conf": (0.0, 0.0, 0.3),
            "thres_view": 3, "num_stage": 3}
    pcd_filter(args, [scan], num_workers=1)
    xyz, _ = read_ply(os.path.join(outdir, "pcd", "mvsnet007_l3.ply"))
    # far fewer surviving points, and survivors still on the plane
    assert len(xyz) < 0.7 * V * H * W
    np.testing.assert_allclose(xyz[:, 2], DEPTH, atol=0.5)
