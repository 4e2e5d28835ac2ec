"""End-to-end accuracy parity vs the PyTorch reference: depth maps ->
fusion -> DTU-protocol eval, side by side, SAME weights (VERDICT r4 #5).

Protocol
--------
1. Render a synthetic multi-scene eval set (textured planes at different
   depths/textures, general_eval layout — utils/synthetic.write_eval_scene).
2. Briefly overfit OUR flagship cascade (48/32/8, inverse depth) on the
   scenes' reference samples; export the weights to a torch state_dict
   with tools/convert_torch_ckpt.export_state_dict (round-trip tested).
3. Produce depth maps with BOTH frameworks from identical inputs (our
   general_eval pipeline feeds both): ours via the real run_test path
   (incl. fusion), torch via the reference networks.mvsnet forward.
4. Push BOTH depth sets through the same fusion (fusion/pcd.py) and the
   DTU evaluator (fusion/dtu_eval.eval_scan) against the known plane
   geometry; record side-by-side overall-mm in PARITY_E2E.json.

The north star (BASELINE.md): repo-vs-torch overall within 2% on the
same inputs (protocol: reference scripts/evaluation_dtu/
ComputeStat_web.m:93-96).

Usage: python tools/parity_e2e.py [--height=448] [--width=576]
       [--scans=2] [--steps=100] [--json=/root/repo/PARITY_E2E.json]
"""

from __future__ import annotations

# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE = "/root/reference"
NDEPTHS = (48, 32, 8)
RATIOS = (4, 2, 1)
NUMDEPTH = 192
VIEWS = 5


def _arg(name, default, cast=int):
    pref = f"--{name}="
    return next((cast(a[len(pref):]) for a in sys.argv if a.startswith(pref)),
                default)


def build_scene_set(datapath, n_scans, h, w):
    from dmvsnet_tpu.utils import synthetic

    depths = [600.0 - 40.0 * i for i in range(n_scans)]
    scans = []
    for i in range(n_scans):
        scan = f"scan{i + 1}"
        synthetic.write_eval_scene(
            datapath, scan, height=h, width=w, n_views=VIEWS,
            depth=depths[i], seed=i,
        )
        scans.append((scan, depths[i]))
    return scans


def make_cfg(datapath, outdir, listfile, h, w, resume=""):
    from dmvsnet_tpu import cli

    args = [
        "--test", "--dataset_name", "general_eval",
        "--datapath", datapath, "--outdir", outdir, "--testlist", listfile,
        "--ndepths", *[str(n) for n in NDEPTHS],
        "--interval_ratio", *[str(r) for r in RATIOS],
        "--numdepth", str(NUMDEPTH), "--max_h", str(h), "--max_w", str(w),
        "--num_view", str(VIEWS), "--inverse_depth",
        "--filter_method", "pcd", "--thres_view", "2",
        "--conf", "0", "0", "0", "--num_worker", "1",
    ]
    if resume:
        args += ["--resume", resume]
    return cli.config_from_args(cli.build_parser().parse_args(args))


def overfit(cfg, datapath, scans, h, w, steps):
    """Overfit the cascade on each scene's reference sample; returns
    (checkpoint path, params, batch_stats)."""
    from dmvsnet_tpu.data import get_dataset
    from dmvsnet_tpu.engine import checkpoint as ckpt_lib
    from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
    from dmvsnet_tpu.engine.steps import make_train_step
    from dmvsnet_tpu.engine.train import build_model

    batches = []
    for scan, plane_z in scans:
        ds = get_dataset(
            "general_eval", datapath, [scan], VIEWS, "test",
            ndepths=NUMDEPTH, max_h=h, max_w=w, inverse_depth=True,
        )
        s = ds[0]
        batches.append({
            "imgs": jnp.asarray(s["imgs"][None]),
            "proj_matrices": {
                k: jnp.asarray(v[None]) for k, v in s["proj_matrices"].items()
            },
            "depth_values": jnp.asarray(s["depth_values"][None]),
            "depth": {
                f"stage{st}": jnp.full((1, h // sc, w // sc), plane_z,
                                       jnp.float32)
                for st, sc in ((1, 4), (2, 2), (3, 1))
            },
            "mask": {
                f"stage{st}": jnp.ones((1, h // sc, w // sc), jnp.float32)
                for st, sc in ((1, 4), (2, 2), (3, 1))
            },
        })

    model = build_model(cfg)
    lr = make_lr_schedule(1e-3, steps_per_epoch=1)
    state = create_train_state(model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(tuple(cfg.dlossw), cfg.depth_mode, lr)
    t0 = time.time()
    scalars = {}
    for i in range(steps):
        state, scalars, _ = step(state, batches[i % len(batches)])
    err = float(scalars["thres4mm_error"])
    print(f"overfit: {steps} steps in {time.time() - t0:.1f}s, "
          f"thres4mm_error {err:.4f}", flush=True)
    assert err < 0.2, "overfit failed; parity comparison would grade noise"
    ckpt = ckpt_lib.save_checkpoint(
        os.path.join(os.path.dirname(cfg.outdir), "ckpt"), 0, state
    )
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    return ckpt, params, stats


def torch_depths(params, stats, datapath, scans, h, w, out_t, out_j):
    """Reference torch forward per ref view on OUR preprocessed inputs;
    writes depth_est/confidence PFMs into out_t (cams/images copied from
    the jax run so fusion sees identical geometry).  Returns per-map
    latency (a measured CPU datapoint for BASELINE.md)."""
    import torch

    from convert_torch_ckpt import export_state_dict
    from dmvsnet_tpu.data import get_dataset
    from dmvsnet_tpu.data import io as data_io

    sys.path.insert(0, REFERENCE)
    try:
        from networks.mvsnet import MVSNet as TorchMVSNet
    finally:
        sys.path.remove(REFERENCE)

    tmodel = TorchMVSNet(
        ndepths=list(NDEPTHS), depth_interval_ratio=list(RATIOS),
        fea_mode="fpn", agg_mode="variance", depth_mode="regression",
        inverse_depth=True,
    )
    sd = {k: torch.from_numpy(v.copy())
          for k, v in export_state_dict(params, stats).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    missing = [m for m in missing if "attn_mask" not in m
               and "num_batches_tracked" not in m]
    assert not missing and not unexpected, (missing, unexpected)
    tmodel.eval()

    lat = []
    for scan, _z in scans:
        ds = get_dataset(
            "general_eval", datapath, [scan], VIEWS, "test",
            ndepths=NUMDEPTH, max_h=h, max_w=w, inverse_depth=True,
        )
        for i in range(len(ds)):
            s = ds[i]
            with torch.no_grad():
                t0 = time.time()
                out = tmodel(
                    torch.from_numpy(
                        s["imgs"][None].transpose(0, 1, 4, 2, 3).copy()
                    ),
                    {k: torch.from_numpy(v[None].copy())
                     for k, v in s["proj_matrices"].items()},
                    torch.from_numpy(s["depth_values"][None].copy()),
                )
                lat.append(time.time() - t0)
            depth = out["depth"].numpy()[0]
            conf = out["photometric_confidence"].numpy()[0]
            fname = s["filename"]
            dp = os.path.join(out_t, fname.format("depth_est", ".pfm"))
            cp = os.path.join(out_t, fname.format("confidence", ".pfm"))
            data_io.save_pfm(dp, depth.astype(np.float32))
            data_io.save_pfm(cp, conf.astype(np.float32))
            print(f"torch {scan} view {i}: {lat[-1]:.2f}s", flush=True)
    # fusion inputs: identical cams/images
    for scan, _z in scans:
        for sub in ("cams", "images"):
            src = os.path.join(out_j, scan, sub)
            dst = os.path.join(out_t, scan, sub)
            if not os.path.isdir(dst):
                shutil.copytree(src, dst)
    return float(np.mean(lat))


def fuse_and_eval(cfg, outdir, datapath, scans):
    """Our pcd fusion + DTU evaluator against the known plane geometry."""
    from dmvsnet_tpu.data import io as data_io
    from dmvsnet_tpu.fusion.dtu_eval import eval_scan
    from dmvsnet_tpu.fusion.pcd import pcd_filter
    from dmvsnet_tpu.fusion.ply import read_ply

    fusion_args = {
        "datapath": datapath, "outdir": outdir, "conf": tuple(cfg.conf),
        "thres_view": cfg.thres_view, "dist_base": cfg.dist_base,
        "rel_diff_base": cfg.rel_diff_base, "num_stage": len(cfg.ndepths),
    }
    pcd_filter(fusion_args, [s for s, _ in scans], 1)

    results = {}
    for idx, (scan, plane_z) in enumerate(scans):
        ply = os.path.join(outdir, "pcd", f"mvsnet{idx + 1:03d}_l3.ply")
        xyz, _ = read_ply(ply)
        assert len(xyz) > 2000, f"{scan}: fusion kept only {len(xyz)} points"
        # GT: backproject the ref view's pixel grid onto the known plane,
        # keep points projecting inside EVERY view (the multi-view-covered
        # region), thinned to the protocol's 0.2 mm-grid-compatible 2 mm
        intr, extr, _ = data_io.read_cam_file(
            os.path.join(datapath, scan, "cams", "00000000_cam.txt")
        )
        h_px = int(2.0 * intr[0, 0] / plane_z)  # ~2 mm in pixels
        # build once from view-0 geometry (ref cam at origin in this set)
        hh, ww = _grid_hw(datapath, scan)
        ys = np.arange(0, hh, max(1, h_px), dtype=np.float64)
        xs = np.arange(0, ww, max(1, h_px), dtype=np.float64)
        gx, gy = np.meshgrid(xs, ys)
        pix = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 0)
        cam_pts = np.linalg.inv(intr[:3, :3]) @ pix * plane_z
        world = np.linalg.inv(extr) @ np.vstack(
            [cam_pts, np.ones((1, cam_pts.shape[1]))]
        )
        stl = world[:3].T
        keep = np.ones(len(stl), bool)
        for v in range(VIEWS):
            intr_v, extr_v, _ = data_io.read_cam_file(
                os.path.join(datapath, scan, "cams", f"{v:08d}_cam.txt")
            )
            p = intr_v[:3, :3] @ (extr_v @ world)[:3]
            uv = p[:2] / p[2]
            keep &= ((uv[0] >= 0) & (uv[0] < ww) & (uv[1] >= 0) & (uv[1] < hh))
        r = eval_scan(xyz.astype(np.float64), stl[keep], scan_id=idx + 1)
        results[scan] = {
            "mean_acc": r.mean_acc, "mean_comp": r.mean_comp,
            "overall": r.overall, "points": int(len(xyz)),
        }
    return results


def _grid_hw(datapath, scan):
    from PIL import Image

    img = Image.open(os.path.join(datapath, scan, "images", "00000000.jpg"))
    return img.height, img.width


def main():
    h = _arg("height", 448)
    w = _arg("width", 576)
    n_scans = _arg("scans", 2)
    steps = _arg("steps", 100)
    out_path = _arg("json", "/root/repo/PARITY_E2E.json", str)

    tmp = tempfile.mkdtemp(prefix="parity_e2e_")
    datapath = os.path.join(tmp, "data")
    out_j = os.path.join(tmp, "out_jax")
    out_t = os.path.join(tmp, "out_torch")
    scans = build_scene_set(datapath, n_scans, h, w)
    listfile = os.path.join(tmp, "list.txt")
    with open(listfile, "w") as f:
        f.writelines(s + "\n" for s, _ in scans)

    cfg = make_cfg(datapath, out_j, listfile, h, w)
    ckpt, params, stats = overfit(cfg, datapath, scans, h, w, steps)

    from dmvsnet_tpu.engine.evaluate import run_test

    run_test(cfg.replace(resume=ckpt))
    res_j = fuse_and_eval(cfg, out_j, datapath, scans)

    torch_s_per_map = torch_depths(params, stats, datapath, scans, h, w,
                                   out_t, out_j)
    cfg_t = make_cfg(datapath, out_t, listfile, h, w)
    res_t = fuse_and_eval(cfg_t, out_t, datapath, scans)

    ov_j = float(np.mean([r["overall"] for r in res_j.values()]))
    ov_t = float(np.mean([r["overall"] for r in res_t.values()]))
    report = {
        "platform": jax.devices()[0].platform,
        "shape": [h, w], "n_views": VIEWS, "scans": len(scans),
        "ndepths": list(NDEPTHS), "train_steps": steps,
        "overall_mm_jax": ov_j, "overall_mm_torch": ov_t,
        "rel_gap": abs(ov_j - ov_t) / max(ov_t, 1e-9),
        "per_scan_jax": res_j, "per_scan_torch": res_t,
        "torch_cpu_s_per_map": torch_s_per_map,
    }
    print(json.dumps(report, indent=1))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    # the BASELINE.md north star: within 2% of the reference
    assert report["rel_gap"] <= 0.02, report["rel_gap"]
    print("parity e2e OK")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
