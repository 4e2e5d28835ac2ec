"""End-to-end geometry gate: NETWORK depths -> fusion -> DTU evaluator.

Every link of this chain is unit-verified elsewhere (torch parity for the
model, ideal-depth fusion, MATLAB-semantics evaluator) — this test grades
the COMPOSITION the DTU protocol actually grades (VERDICT r2 #5): overfit
the cascade on a synthetic textured plane, run the real test pipeline
(run_test -> PFM export -> pcd fusion -> PLY), then eval_scan the fused
cloud against the known plane geometry and assert a mm-scale bound
(the reference's empirical chain: reference README.md:79-93,
scripts/evaluation_dtu/ComputeStat_web.m:93-96).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvsnet_tpu import cli
from dmvsnet_tpu.data import get_dataset
from dmvsnet_tpu.engine import checkpoint as ckpt_lib
from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
from dmvsnet_tpu.engine.steps import make_train_step
from dmvsnet_tpu.engine.train import build_model
from dmvsnet_tpu.fusion.dtu_eval import eval_scan
from dmvsnet_tpu.fusion.ply import read_ply
from dmvsnet_tpu.utils import synthetic

H, W, VIEWS, PLANE_Z = 96, 128, 4, 600.0


def _cfg(datapath, outdir, listfile, resume=""):
    args = [
        "--test", "--dataset_name", "general_eval",
        "--datapath", datapath, "--outdir", outdir, "--testlist", listfile,
        "--ndepths", "8", "8", "8", "--interval_ratio", "4", "2", "1",
        "--numdepth", "32", "--max_h", str(H), "--max_w", str(W),
        "--num_view", str(VIEWS), "--inverse_depth",
        "--filter_method", "pcd", "--thres_view", "2",
        "--conf", "0", "0", "0", "--num_worker", "1",
    ]
    if resume:
        args += ["--resume", resume]
    return cli.config_from_args(cli.build_parser().parse_args(args))


@pytest.mark.slow
def test_geometry_gate_overfit_fuse_eval(tmp_path):
    datapath = str(tmp_path / "data")
    outdir = str(tmp_path / "out")
    synthetic.write_eval_scene(
        datapath, "scan1", height=H, width=W, n_views=VIEWS, depth=PLANE_Z
    )
    listfile = str(tmp_path / "list.txt")
    with open(listfile, "w") as f:
        f.write("scan1\n")
    cfg = _cfg(datapath, outdir, listfile)

    # ---- overfit the real model on the scene's own reference sample ----
    ds = get_dataset(
        "general_eval", datapath, ["scan1"], VIEWS, "test",
        ndepths=cfg.numdepth, max_h=H, max_w=W, inverse_depth=True,
    )
    sample = ds[0]
    batch = {
        "imgs": jnp.asarray(sample["imgs"][None]),
        "proj_matrices": {
            k: jnp.asarray(v[None]) for k, v in sample["proj_matrices"].items()
        },
        "depth_values": jnp.asarray(sample["depth_values"][None]),
        "depth": {
            f"stage{s}": jnp.full((1, H // sc, W // sc), PLANE_Z, jnp.float32)
            for s, sc in ((1, 4), (2, 2), (3, 1))
        },
        "mask": {
            f"stage{s}": jnp.ones((1, H // sc, W // sc), jnp.float32)
            for s, sc in ((1, 4), (2, 2), (3, 1))
        },
    }
    model = build_model(cfg)
    lr = make_lr_schedule(1e-3, steps_per_epoch=1)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, lr)
    step = make_train_step(tuple(cfg.dlossw), cfg.depth_mode, lr)
    scalars = {}
    for _ in range(80):
        state, scalars, _aux = step(state, batch)
    # the net must have actually learned the scene, otherwise the bound
    # below would grade fusion's rejection power instead of the chain
    assert float(scalars["thres4mm_error"]) < 0.15, dict(
        (k, float(v)) for k, v in scalars.items()
    )
    ckpt = ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), 0, state)

    # ---- the real inference + fusion pipeline ----
    from dmvsnet_tpu.engine.evaluate import run_test

    run_test(cfg.replace(resume=ckpt))
    xyz, _rgb = read_ply(os.path.join(outdir, "pcd", "mvsnet001_l3.ply"))
    assert len(xyz) > 5000, f"fusion kept only {len(xyz)} points"

    # ---- DTU-protocol evaluation against the known plane ----
    # GT "stl": a 2 mm grid on z=PLANE_Z over the region seen by all views
    # (ref cam at origin, f=1.2W; the farthest cam is shifted 36 mm)
    xs = np.arange(-150.0, 150.0, 2.0)
    ys = np.arange(-120.0, 120.0, 2.0)
    gx, gy = np.meshgrid(xs, ys)
    stl = np.stack(
        [gx.ravel(), gy.ravel(), np.full(gx.size, PLANE_Z)], axis=1
    )
    r = eval_scan(xyz.astype(np.float64), stl, scan_id=1)

    # mm-scale gate: fused points sit on the plane (accuracy) and cover
    # the common-visibility region (completeness)
    assert r.mean_acc < 4.0, r
    assert r.mean_comp < 4.0, r
    assert r.overall < 4.0, r
    # plane fit sanity: the fused cloud's z spread is tight
    assert abs(float(np.median(xyz[:, 2])) - PLANE_Z) < 2.0
