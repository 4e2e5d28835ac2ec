"""Depth-map inference runner + fusion dispatch (the reference's
Model.test, reference model.py:301-390).

Per scene: per-scene T&T resolution override, a fresh eval dataset, the
jitted infer step per sample, and the compatibility outputs —
depth_est/*.pfm, confidence/*.pfm, cams/*_cam.txt, images/*.jpg — then
pcd / dypcd fusion over the scan list.

XLA note: jit recompiles per input shape.  Scenes resolve to a handful
of snapped (h, w) buckets (multiples of 32, reference general_eval.py:7),
so the compile cache warms once per bucket, not per sample.
"""

from __future__ import annotations

import os
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from dmvsnet_tpu.config import Config
from dmvsnet_tpu.data import get_dataset, io
from dmvsnet_tpu.data.splits import resolve_scan_list
from dmvsnet_tpu.engine import checkpoint as ckpt_lib
from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
from dmvsnet_tpu.engine.steps import make_infer_step
from dmvsnet_tpu.engine.train import build_model
from dmvsnet_tpu.fusion import TANK_SCENE_CONFIG, dypcd_filter, pcd_filter


def run_test(cfg: Config) -> None:
    if cfg.testpath_single_scene:
        # single-scene mode: datapath = parent dir, scan = basename
        # (reference model.py:305-316)
        cfg = cfg.replace(datapath=os.path.dirname(cfg.testpath_single_scene))
        scans = [os.path.basename(cfg.testpath_single_scene)]
    else:
        scans = resolve_scan_list(cfg.testlist, cfg.datapath)
    model = build_model(cfg, eval_mode=True)
    infer = make_infer_step()
    state = None

    # fix_res latch carried ACROSS per-scene datasets: the reference keeps
    # it in module globals (reference general_eval.py:7-8,150-154) so it
    # survives the fresh per-scene loader of model.py:330; here the latch
    # is threaded explicitly through each dataset's fixed_hw.
    latched_hw = None
    for scene in scans:
        max_h, max_w = cfg.max_h, cfg.max_w
        if scene in TANK_SCENE_CONFIG:
            sc = TANK_SCENE_CONFIG[scene]
            max_h, max_w = sc.max_h, sc.max_w

        ds = get_dataset(
            "general_eval", cfg.datapath, [scene], cfg.num_view, "test",
            ndepths=cfg.numdepth, interval_scale=cfg.interval_scale,
            max_h=max_h, max_w=max_w, fix_res=cfg.fix_res,
            inverse_depth=cfg.inverse_depth, fixed_hw=latched_hw,
        )
        eb = max(1, int(getattr(cfg, "eval_batch", 1)))

        def load_batch(start):
            samples = [ds[i] for i in range(start, min(start + eb, len(ds)))]
            nreal = len(samples)
            # pad the tail batch by repetition: one compiled shape per
            # scene bucket, padded outputs discarded below
            samples = samples + [samples[-1]] * (eb - nreal)
            imgs = np.stack([s["imgs"] for s in samples])
            proj = {
                k: np.stack([s["proj_matrices"][k] for s in samples])
                for k in samples[0]["proj_matrices"]
            }
            dvb = np.stack([s["depth_values"] for s in samples])
            return samples, nreal, imgs, proj, dvb

        # one-batch-ahead prefetch: decode batch k+1 on a worker thread
        # while the device runs batch k (the reference leans on torch
        # DataLoader workers for this, model.py:330)
        import concurrent.futures as _cf

        starts = list(range(0, len(ds), eb))
        with _cf.ThreadPoolExecutor(max_workers=1) as pool:
            futures = {starts[0]: pool.submit(load_batch, starts[0])} if starts else {}
            for si, start in enumerate(starts):
                samples, nreal, imgs_np, proj_np, dv_np = futures.pop(start).result()
                if si + 1 < len(starts):
                    futures[starts[si + 1]] = pool.submit(load_batch, starts[si + 1])
                imgs = jnp.asarray(imgs_np)
                proj = {k: jnp.asarray(v) for k, v in proj_np.items()}
                dv = jnp.asarray(dv_np)

                if state is None:
                    # init once at the first sample's shapes; restore weights
                    batch = {"imgs": imgs, "proj_matrices": proj, "depth_values": dv}
                    state = create_train_state(
                        model, jax.random.PRNGKey(0), batch,
                        make_lr_schedule(1e-3, 1),
                    )
                    if cfg.resume:
                        state, _ = ckpt_lib.restore_checkpoint(
                            cfg.resume, state, weights_only=True
                        )
                    # params/FLOPs line (the reference's one-time thop print,
                    # reference model.py:338-342)
                    try:
                        from dmvsnet_tpu.engine.profiler import model_summary

                        s = model_summary(
                            model,
                            {"params": state.params, "batch_stats": state.batch_stats},
                            imgs, proj, dv,
                        )
                        print(
                            f"params: {s['params']:,}  flops: {s['flops']:.3e}  "
                            f"bytes: {s['bytes_accessed']:.3e}", flush=True,
                        )
                    except Exception as e:  # cost analysis is best-effort
                        print(f"model summary unavailable: {e}")

                t0 = time.time()
                depth_b, conf_b = infer(state, imgs, proj, dv)
                depth_b = np.asarray(jax.block_until_ready(depth_b))
                conf_b = np.asarray(conf_b)
                print(
                    f"{scene} [{start}..{start + nreal - 1}/{len(ds)}] "
                    f"{depth_b.shape[1:]} {time.time() - t0:.3f}s", flush=True,
                )

                for j in range(nreal):
                    sample, depth, conf = samples[j], depth_b[j], conf_b[j]
                    fname = sample["filename"]
                    depth_path = os.path.join(cfg.outdir, fname.format("depth_est", ".pfm"))
                    conf_path = os.path.join(cfg.outdir, fname.format("confidence", ".pfm"))
                    cam_path = os.path.join(cfg.outdir, fname.format("cams", "_cam.txt"))
                    img_path = os.path.join(cfg.outdir, fname.format("images", ".jpg"))
                    io.save_pfm(depth_path, depth.astype(np.float32))
                    io.save_pfm(conf_path, conf.astype(np.float32))
                    io.write_cam_file(cam_path, sample["proj_matrices"]["stage3"][0])
                    os.makedirs(os.path.dirname(img_path), exist_ok=True)
                    cv2.imwrite(
                        img_path,
                        cv2.cvtColor(
                            np.clip(sample["imgs"][0] * 255, 0, 255).astype(np.uint8),
                            cv2.COLOR_RGB2BGR,
                        ),
                    )
        if cfg.fix_res:
            latched_hw = ds.latched_hw

    fusion_args = {
        "datapath": cfg.datapath, "outdir": cfg.outdir, "conf": tuple(cfg.conf),
        "thres_view": cfg.thres_view, "dist_base": cfg.dist_base,
        "rel_diff_base": cfg.rel_diff_base, "num_stage": len(cfg.ndepths),
    }
    if cfg.filter_method == "pcd":
        pcd_filter(fusion_args, scans, cfg.num_worker)
    elif cfg.filter_method == "dypcd":
        dypcd_filter(fusion_args, scans, 1)
    elif cfg.filter_method not in ("none", ""):
        raise NotImplementedError(
            f"filter_method={cfg.filter_method!r} (gipuma is disabled in the "
            "reference too, filter/__init__.py:1)"
        )


def run_visualization(depth_path: str, save_dir: str = ".") -> str:
    """PFM -> magma-colormapped PNG at the 95th percentile
    (reference model.py:392-410)."""
    import matplotlib.cm as cm
    import matplotlib.colors as mcolors
    from PIL import Image

    depth, _ = io.read_pfm(depth_path)
    vmax = np.percentile(depth, 95)
    norm = mcolors.Normalize(vmin=depth.min(), vmax=vmax)
    rgba = cm.ScalarMappable(norm=norm, cmap="magma").to_rgba(depth)
    out = os.path.join(save_dir, "depth.png")
    os.makedirs(save_dir, exist_ok=True)
    Image.fromarray((rgba[:, :, :3] * 255).astype(np.uint8)).save(out)
    return out
