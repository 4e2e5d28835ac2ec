"""End-to-end CLI tests on synthetic on-disk scenes (CPU, small shapes)."""

import json
import os

import numpy as np
import pytest

from dmvsnet_tpu import cli
from dmvsnet_tpu.data import io
from dmvsnet_tpu.utils import synthetic


def test_cli_test_mode_writes_outputs_and_fuses(tmp_path):
    datapath = str(tmp_path / "data")
    outdir = str(tmp_path / "out")
    synthetic.write_eval_scene(datapath, "scan1", height=128, width=160, n_views=4)
    listfile = str(tmp_path / "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")

    cli.main([
        "--test", "--dataset_name", "general_eval",
        "--datapath", datapath, "--outdir", outdir, "--testlist", listfile,
        "--ndepths", "8", "8", "8", "--interval_ratio", "4", "2", "1",
        "--numdepth", "32", "--max_h", "128", "--max_w", "160",
        "--num_view", "4", "--inverse_depth",
        "--filter_method", "pcd", "--thres_view", "2",
        "--conf", "0", "0", "0", "--num_worker", "1",
    ])

    # reference-compatible artifacts exist and parse
    depth, _ = io.read_pfm(os.path.join(outdir, "scan1/depth_est/00000000.pfm"))
    conf, _ = io.read_pfm(os.path.join(outdir, "scan1/confidence/00000000.pfm"))
    assert depth.shape == (128, 160) and conf.shape == (128, 160)
    assert np.isfinite(depth).all()
    intr, extr, _ = io.read_cam_file(os.path.join(outdir, "scan1/cams/00000000_cam.txt"))
    assert intr.shape == (3, 3) and extr.shape == (4, 4)
    assert os.path.exists(os.path.join(outdir, "scan1/images/00000000.jpg"))
    # fused point cloud written
    assert os.path.exists(os.path.join(outdir, "pcd/mvsnet001_l3.ply"))

    # vis mode colormaps the depth map
    cli.main([
        "--vis", "--depth_path", os.path.join(outdir, "scan1/depth_est/00000000.pfm"),
        "--depth_img_save_dir", str(tmp_path),
    ])
    assert os.path.exists(str(tmp_path / "depth.png"))


def test_eval_batching_matches_single(tmp_path):
    """eval_batch>1 (batched ref-view inference incl. a padded tail
    batch) must match eval_batch=1 to fp-reassociation noise (the B>1
    program reassociates conv reductions; measured max delta 5e-4 mm)."""
    datapath = str(tmp_path / "data")
    synthetic.write_eval_scene(datapath, "scan1", height=128, width=160, n_views=4)
    listfile = str(tmp_path / "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")

    common = [
        "--test", "--dataset_name", "general_eval",
        "--datapath", datapath, "--testlist", listfile,
        "--ndepths", "8", "8", "8", "--interval_ratio", "4", "2", "1",
        "--numdepth", "32", "--max_h", "128", "--max_w", "160",
        "--num_view", "4", "--inverse_depth", "--filter_method", "none",
    ]
    out1 = str(tmp_path / "out1")
    out3 = str(tmp_path / "out3")
    cli.main(common + ["--outdir", out1, "--eval_batch", "1"])
    # 4 ref views with batch 3 -> one full batch + a padded tail of 1
    cli.main(common + ["--outdir", out3, "--eval_batch", "3"])

    views = sorted(os.listdir(os.path.join(out1, "scan1/depth_est")))
    assert len(views) == 4
    for v in views:
        d1, _ = io.read_pfm(os.path.join(out1, "scan1/depth_est", v))
        d3, _ = io.read_pfm(os.path.join(out3, "scan1/depth_est", v))
        np.testing.assert_allclose(d1, d3, atol=1e-2)  # depth unit = mm
        c1, _ = io.read_pfm(os.path.join(out1, "scan1/confidence", v))
        c3, _ = io.read_pfm(os.path.join(out3, "scan1/confidence", v))
        np.testing.assert_allclose(c1, c3, atol=1e-4)


def test_cli_preset_and_overrides():
    cfg = cli.config_from_args(
        cli.build_parser().parse_args(
            ["--preset", "dtu_test", "--datapath", "/x", "--max_h", "512"]
        )
    )
    assert cfg.dataset_name == "general_eval"
    assert cfg.inverse_depth is True
    assert cfg.conf == (0.0, 0.0, 0.3)  # dtu_test.sh values
    assert cfg.max_h == 512 and cfg.max_w == 1152
    assert cfg.datapath == "/x"

    cfg = cli.config_from_args(
        cli.build_parser().parse_args(["--preset", "tank_test"])
    )
    assert cfg.ndepths == (64, 32, 8) and cfg.filter_method == "dypcd"
