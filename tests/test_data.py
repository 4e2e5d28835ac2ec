"""Data-layer tests: format round trips + dataset pipelines on synthetic
on-disk scenes (no real DTU/BlendedMVS data needed)."""

import os

import numpy as np
import pytest

from dmvsnet_tpu.data import io, splits
from dmvsnet_tpu.data.loader import get_dataset, make_loader
from dmvsnet_tpu.utils import synthetic


def test_pfm_round_trip(tmp_path, rng):
    img = rng.normal(size=(37, 53)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    io.save_pfm(p, img)
    back, scale = io.read_pfm(p)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_reads_reference_writer_output(tmp_path, rng):
    """Cross-check against the torch reference's PFM writer semantics:
    our reader must accept files from the reference ecosystem."""
    img = rng.normal(size=(8, 6)).astype(np.float32)
    p = str(tmp_path / "ref.pfm")
    # write in the reference's format by hand (flipud + negative scale)
    with open(p, "wb") as f:
        f.write(b"Pf\n6 8\n-1.000000\n")
        np.flipud(img).astype("<f4").tofile(f)
    back, _ = io.read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_cam_file_round_trip(tmp_path, rng):
    cam = synthetic.camera_stack(320.0, 320.0, 80.0, 64.0, tx=1.5, angle=0.2)
    cam[1, 3, :] = [425.0, 2.5, 192.0, 905.0]
    p = str(tmp_path / "c_cam.txt")
    io.write_cam_file(p, cam)
    intr, extr, depth_line = io.read_cam_file(p)
    np.testing.assert_allclose(intr, cam[1, :3, :3], rtol=1e-6)
    np.testing.assert_allclose(extr, cam[0], rtol=1e-6)
    assert depth_line[:2] == [425.0, 2.5]


def test_pair_file_round_trip(tmp_path):
    pairs = [(0, [3, 1, 2]), (1, [0, 2]), (2, [1])]
    p = str(tmp_path / "pair.txt")
    io.write_pair_file(p, pairs)
    assert io.read_pair_file(p) == pairs


def test_splits():
    assert len(splits.dtu_scans("train")) == 79
    assert len(splits.dtu_scans("val")) == 18
    assert len(splits.dtu_scans("test")) == 22
    assert splits.dtu_scans("single") == ["scan48", "scan49", "scan62"]


def test_dtu_train_dataset(tmp_path):
    root = str(tmp_path)
    synthetic.write_dtu_training_tree(root, scans=("scan1", "scan2"), n_views=4)
    ds = get_dataset("dtu_yao", root, ["scan1", "scan2"], nviews=3, mode="train")
    # 2 scans x 4 ref views x 7 lights
    assert len(ds) == 2 * 4 * 7
    s = ds[0]
    assert s["imgs"].shape == (3, 512, 640, 3)
    assert s["depth"]["stage3"].shape == (512, 640)
    assert s["depth"]["stage1"].shape == (128, 160)
    assert s["mask"]["stage3"].min() == 1.0
    assert s["depth_values"].shape == (192,)
    np.testing.assert_allclose(s["depth"]["stage3"], 600.0)
    # stage intrinsics scale x2 per stage
    f1 = s["proj_matrices"]["stage1"][0, 1, 0, 0]
    f3 = s["proj_matrices"]["stage3"][0, 1, 0, 0]
    np.testing.assert_allclose(f3 / f1, 4.0, rtol=1e-6)


def test_general_eval_dataset(tmp_path):
    root = str(tmp_path)
    synthetic.write_eval_scene(root, "scan1", height=128, width=160, n_views=4)
    ds = get_dataset(
        "general_eval", root, ["scan1"], nviews=3, mode="test",
        max_h=128, max_w=160, inverse_depth=True,
    )
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (3, 128, 160, 3)
    assert s["filename"] == "scan1/{}/00000000{}"
    dv = s["depth_values"]
    assert dv.shape == (192,)
    assert dv[0] > 0 and np.all(np.diff(1.0 / dv) < 0)  # inverse-uniform increasing depth
    # full-res intrinsics recovered: reader /4, stage3 x4
    f3 = s["proj_matrices"]["stage3"][0, 1, 0, 0]
    np.testing.assert_allclose(f3, 1.2 * 160, rtol=1e-4)


def test_general_eval_resolution_snap(tmp_path):
    root = str(tmp_path)
    synthetic.write_eval_scene(root, "scanX", height=160, width=224, n_views=3)
    ds = get_dataset(
        "general_eval", root, ["scanX"], nviews=3, mode="test",
        max_h=128, max_w=160,
    )
    s = ds[0]
    h, w = s["imgs"].shape[1:3]
    assert h % 32 == 0 and w % 32 == 0 and h <= 128 and w <= 160


def test_loader_sharding_and_batching(tmp_path):
    root = str(tmp_path)
    synthetic.write_dtu_training_tree(root, scans=("scan1",), n_views=4)
    ds = get_dataset("dtu_yao", root, ["scan1"], nviews=3, mode="train")
    loader = make_loader(ds, batch_size=2, mode="train", num_hosts=2, host_id=0)
    batches = list(loader)
    assert len(batches) == len(loader) == (len(ds) // 2) // 2
    b = batches[0]
    assert b["imgs"].shape == (2, 3, 512, 640, 3)
    assert b["depth"]["stage1"].shape == (2, 128, 160)

    # different hosts see disjoint samples at the same epoch
    l0 = make_loader(ds, batch_size=1, mode="train", num_hosts=2, host_id=0)
    l1 = make_loader(ds, batch_size=1, mode="train", num_hosts=2, host_id=1)
    i0 = set(map(int, l0._host_indices()))
    i1 = set(map(int, l1._host_indices()))
    assert not (i0 & i1) and len(i0 | i1) == len(ds)

    # epoch reshuffle changes order (set_epoch semantics)
    before = list(l0._host_indices())
    l0.set_epoch(1)
    assert list(l0._host_indices()) != before


def test_blendedmvs_contrast_uses_luma_mean():
    """torchvision adjust_contrast semantics: blend toward the mean of the
    ITU-R 601 grayscale (no torchvision in this image — hand oracle)."""
    from dmvsnet_tpu.data.blendedmvs import color_jitter

    class FixedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def uniform(self, lo, hi):
            return self.vals.pop(0)

    img = np.zeros((2, 3, 3), np.float32)
    img[..., 0] = 0.8  # pure red: luma mean 0.299*0.8, rgb mean 0.8/3
    out = color_jitter(img, FixedRng([1.0, 0.5]))  # brightness 1, contrast .5
    luma = 0.299 * 0.8
    np.testing.assert_allclose(out[..., 0], luma + (0.8 - luma) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], luma + (0.0 - luma) * 0.5, rtol=1e-6)


def test_fix_res_latch_threads_across_scenes(tmp_path):
    """fix_res must latch the FIRST scene's snapped resolution and apply it
    to later scenes (reference keeps a module-global s_h/s_w latch,
    general_eval.py:150-168; here the runner threads ds.latched_hw into the
    next scene's fixed_hw — engine/evaluate.py run_test)."""
    root = str(tmp_path)
    synthetic.write_eval_scene(root, "scanA", height=128, width=160, n_views=3)
    synthetic.write_eval_scene(root, "scanB", height=160, width=224, n_views=3)

    ds1 = get_dataset(
        "general_eval", root, ["scanA"], nviews=3, mode="test",
        max_h=256, max_w=256, fix_res=True,
    )
    s1 = ds1[0]
    assert ds1.latched_hw == tuple(s1["imgs"].shape[1:3])

    ds2 = get_dataset(
        "general_eval", root, ["scanB"], nviews=3, mode="test",
        max_h=256, max_w=256, fix_res=True, fixed_hw=ds1.latched_hw,
    )
    s2 = ds2[0]
    # scanB's native snap would be (160, 224); the latch forces scanA's
    assert tuple(s2["imgs"].shape[1:3]) == ds1.latched_hw
    assert ds2.latched_hw == ds1.latched_hw


def test_loader_pads_ragged_final_eval_batch(tmp_path):
    """drop_last=False loaders wrap-pad the final batch to full size so the
    dp-sharded eval step never sees a non-divisible batch axis."""
    root = str(tmp_path)
    synthetic.write_dtu_training_tree(root, scans=("scan1",), n_views=4)
    ds = get_dataset("dtu_yao", root, ["scan1"], nviews=3, mode="train")
    ds.metas = ds.metas[:7]  # 7 samples, batch 4 -> ragged tail of 3
    loader = make_loader(ds, batch_size=4, mode="val")
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert all(b["imgs"].shape[0] == 4 for b in batches)


def test_resolve_scan_list_rejects_mistyped_filenames(tmp_path):
    with pytest.raises(FileNotFoundError):
        splits.resolve_scan_list("train_list")  # missing file, not a scan
    assert splits.resolve_scan_list("scan1,scan4") == ["scan1", "scan4"]
    assert splits.resolve_scan_list("scans:fam_hash1,fam_hash2") == [
        "fam_hash1", "fam_hash2"
    ]
    lst = tmp_path / "mylist.txt"
    lst.write_text("scan9\nscan10\n")
    assert splits.resolve_scan_list(str(lst)) == ["scan9", "scan10"]
