"""Prove the bench's numerics mode: Pallas DEFAULT vs HIGHEST vs XLA.

The headline benchmark (bench.py) runs the Pallas warp kernel's band
matmuls at ``Precision.DEFAULT`` (one bf16 pass).  All parity tests run
HIGHEST/interpret.  This tool closes that gap on the REAL chip: it runs
the full cascade forward three ways at a realistic DTU-eval shape —

  * Pallas warp, MATMUL_PRECISION = DEFAULT   (the bench config)
  * Pallas warp, MATMUL_PRECISION = HIGHEST   (bit-parity config)
  * XLA gather warp                           (the reference semantics)

— on the synthetic textured scene and reports depth-map / confidence
deltas in mm (depth unit = mm, DTU range 425-935).  Asserts the pinned
tolerances (documented next to MATMUL_PRECISION in
ops/pallas/warp_correlate.py) and writes NUMERICS.json.

Usage: python tools/numerics_check.py [--full] [--json=PATH]
  --full uses the exact bench shape 864x1152 (slow first compile of the
  HIGHEST/XLA variants through the remote-compile tunnel); default is
  448x576, which exercises identical kernel code paths per VERDICT r2 #3.
"""

from __future__ import annotations


# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Pinned tolerances (mm) for DEFAULT-vs-HIGHEST on the full model.
# bf16 rounding perturbs O(1) correlations by ~1e-2 absolute; through
# softmax + expectation over depth hypotheses this moves the regressed
# depth by well under a stage-3 interval (2.66 mm at the DTU config).
TOL_MEAN_MM = 0.2
TOL_P99_MM = 2.0
TOL_MAX_MM = 10.0
TOL_CONF_MEAN = 5e-3

# Pinned tolerances for the APPROXIMATE epipolar eval path (rectified
# 1-D sweeps add two bilinear resamples): the bar for flipping it to the
# default eval mode (VERDICT r3 #5) is depth-metric neutrality — errors
# well under the stage-3 hypothesis interval (2.66 mm at the DTU config)
# in the mean/p99, with a bounded tail at depth discontinuities.
EPI_TOL_MEAN_MM = 0.5
EPI_TOL_P99_MM = 5.0
EPI_TOL_MAX_MM = 60.0


def run_forward(height, width, precision, use_pallas, use_epipolar=False,
                costreg_bf16=False, feature_bf16=False):
    import jax.numpy as jnp

    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.ops.pallas import warp_correlate
    from dmvsnet_tpu.utils import synthetic

    warp_correlate.MATMUL_PRECISION = precision
    model = MVSNet(
        ndepths=(48, 32, 8), depth_interval_ratio=(4, 2, 1),
        inverse_depth=True, use_pallas_warp=use_pallas,
        use_epipolar_warp=use_epipolar,
        costreg_dtype=jnp.bfloat16 if costreg_bf16 else None,
        feature_dtype=jnp.bfloat16 if feature_bf16 else None,
    )
    batch = synthetic.make_batch(
        batch=1, n_views=5, height=height, width=width, n_depths=192
    )
    imgs = jnp.asarray(batch["imgs"])
    proj = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])
    # init once per shape, jitted (persistently cached), and reuse across
    # variants: the flag combinations (epipolar / bf16 nets / precision)
    # change only compute dtypes and kernel routing, never the param tree
    # (params are PRNG-derived fp32, batch_stats are constant-initialized)
    key = (height, width)
    if key not in _VARS_CACHE:
        _VARS_CACHE[key] = jax.jit(model.init)(
            jax.random.PRNGKey(0), imgs, proj, dv
        )
    variables = _VARS_CACHE[key]

    @jax.jit
    def fwd(variables, imgs, proj, dv):
        out = model.apply(variables, imgs, proj, dv, train=False)
        return out["depth"], out["photometric_confidence"]

    depth, conf = fwd(variables, imgs, proj, dv)
    return np.asarray(depth, np.float64), np.asarray(conf, np.float64)


_VARS_CACHE: dict = {}


def epipolar_engagement(height, width):
    """Per-(stage, view) booleans: does the 1-D sweep engage (vs falling
    back to the 2-D kernel) for the synthetic scene's geometry?  Both
    cost passes are probed: the D-plane inverse-fan sweep and a
    representative 4-plane refine fan (arithmetic in depth — the
    checkerboard stacks' structure, depth_net.forward)."""
    import jax.numpy as jnp

    from dmvsnet_tpu.core import geometry, sampling
    from dmvsnet_tpu.ops.pallas.epipolar_sweep import sweep_engaged
    from dmvsnet_tpu.utils import synthetic

    batch = synthetic.make_batch(
        batch=1, n_views=5, height=height, width=width, n_depths=192
    )
    proj = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])
    out = {}
    for s, (c, d) in enumerate(zip((32, 16, 8), (48, 32, 8))):
        scale = 2 ** (2 - s)
        sh, sw = height // scale, width // scale
        stage = f"stage{s + 1}"
        interval = (
            jnp.float32((4, 2, 1)[s]) * (dv[0, -1] - dv[0, 0]) / dv.shape[1]
        )
        if s == 0:
            samples, _ = sampling.stage1_samples(dv, d, sh, sw, inverse=True)
        else:
            mid = jnp.full((1, sh, sw), float(dv[0, dv.shape[1] // 2]))
            samples, _ = sampling.cascade_samples(
                mid, d, interval, inverse=True,
            )
        # representative refine fan: 4 planes arithmetic in depth about
        # the mid hypothesis with the stage interval
        mid_d = jnp.full((sh, sw), float(dv[0, dv.shape[1] // 2]))
        ds4 = jnp.arange(4, dtype=jnp.float32) - 1.5
        refine_fan = mid_d[None] + ds4[:, None, None] * interval
        fused = geometry.fuse_projection(proj[stage])[0]
        rels = [geometry.relative_projection(fused[v], fused[0])
                for v in range(1, 5)]
        out[stage] = [sweep_engaged(rel, samples[0], sh, sw, c)
                      for rel in rels]
        out[stage + "_refine"] = [
            sweep_engaged(rel, refine_fan, sh, sw, c) for rel in rels
        ]
    return out


def stats(a, b):
    d = np.abs(a - b)
    return {
        "mean": float(d.mean()),
        "p99": float(np.percentile(d, 99)),
        "max": float(d.max()),
    }


# Max warp-coordinate error (px) the device geometry may carry vs an
# exact float64 host computation.  On chip, XLA's DEFAULT precision runs
# fp32 contractions as bf16 MXU passes: before round 5 pinned
# Precision.HIGHEST in core/geometry.py, the measured error here was
# ~0.2% of the coordinate magnitude (whole pixels at full res) — shared
# by every on-chip path, so no A/B gate could see it.
TOL_GEOM_PX = 1e-2


def geometry_precision(height, width):
    """Device warp coordinates + rectification vs float64 numpy."""
    import jax.numpy as jnp

    from dmvsnet_tpu.core import epipolar, geometry
    from dmvsnet_tpu.utils import synthetic

    batch = synthetic.make_batch(
        batch=1, n_views=5, height=height, width=width, n_depths=192
    )
    proj = np.asarray(batch["proj_matrices"]["stage3"], np.float64)[0]
    dv = np.asarray(batch["depth_values"], np.float64)[0]

    # float64 host reference
    def fuse64(p2):
        top = p2[1, :3, :3] @ p2[0, :3, :4]
        return np.vstack([top, p2[0, 3:4, :]])

    ref64 = fuse64(proj[0])
    src64 = fuse64(proj[1])
    rel64 = src64 @ np.linalg.inv(ref64)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    rays = np.stack([xs, ys, np.ones_like(xs)])
    d0 = dv[0]
    p = np.einsum("ij,jhw->ihw", rel64[:3, :3], rays) * d0 + rel64[:3, 3][:, None, None]
    px64, py64 = p[0] / p[2], p[1] / p[2]

    proj_j = jnp.asarray(proj, jnp.float32)[None]
    fused = geometry.fuse_projection(proj_j)
    rel = geometry.relative_projection(fused[:, 1], fused[:, 0])
    px, py = geometry.plane_sweep_coords(
        rel, jnp.asarray([[d0]], jnp.float32), height, width
    )
    e_coords = float(max(np.abs(np.asarray(px[0, 0], np.float64) - px64).max(),
                         np.abs(np.asarray(py[0, 0], np.float64) - py64).max()))

    rect = epipolar.compute_rectification(rel[0], height, width)
    rxx, rxy = epipolar.rect_grid_coords(rect.h_ref, height, width)
    # float64 rectification reference re-derives only the grid mapping:
    # device h_ref itself is checked through the grid (inv3 + apply_h)
    h64 = np.asarray(rect.h_ref, np.float64)
    hinv = np.linalg.inv(h64)
    den = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    rx64 = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / den
    ry64 = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / den
    e_rect = float(max(np.abs(np.asarray(rxx, np.float64) - rx64).max(),
                       np.abs(np.asarray(rxy, np.float64) - ry64).max()))
    return {"warp_coords_px": e_coords, "rect_grid_px": e_rect}


def main():
    full = "--full" in sys.argv
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--json=")),
        "/root/repo/NUMERICS.json",
    )
    h, w = (864, 1152) if full else (448, 576)

    d_hi, c_hi = run_forward(h, w, jax.lax.Precision.HIGHEST, True)
    d_def, c_def = run_forward(h, w, jax.lax.Precision.DEFAULT, True)
    d_xla, c_xla = run_forward(h, w, jax.lax.Precision.HIGHEST, False)

    report = {
        "platform": jax.devices()[0].platform,
        "shape": [h, w],
        "geometry_precision_px": geometry_precision(h, w),
        "depth_default_vs_highest_mm": stats(d_def, d_hi),
        "depth_pallas_vs_xla_mm": stats(d_hi, d_xla),
        "conf_default_vs_highest": stats(c_def, c_hi),
        "conf_pallas_vs_xla": stats(c_hi, c_xla),
        "tol": {"mean_mm": TOL_MEAN_MM, "p99_mm": TOL_P99_MM,
                "max_mm": TOL_MAX_MM, "conf_mean": TOL_CONF_MEAN},
    }
    if "--epipolar" in sys.argv:
        # the APPROXIMATE eval path (rectified 1-D sweeps), compared at
        # the FULL eval resolution (864x1152) regardless of --full: the
        # default-vs-epipolar pair is what gates the default-eval flip
        # (VERDICT r3 #5), and the full-res default program is the bench
        # program (compile-cache warm).  The XLA anchor stays at the
        # probe shape; default-vs-XLA there + epipolar-vs-default here
        # bound epipolar-vs-XLA by the triangle inequality.
        eh, ew = 864, 1152
        d_deff, c_deff = (d_def, c_def) if (eh, ew) == (h, w) else \
            run_forward(eh, ew, jax.lax.Precision.DEFAULT, True)
        d_epi, c_epi = run_forward(eh, ew, jax.lax.Precision.DEFAULT, True,
                                   use_epipolar=True)
        report["epipolar_shape"] = [eh, ew]
        report["depth_epipolar_vs_default_mm"] = stats(d_epi, d_deff)
        report["conf_epipolar_vs_default"] = stats(c_epi, c_deff)
        report["epipolar_engaged"] = epipolar_engagement(eh, ew)
        # the comparison is only meaningful if the sweep actually ran:
        # stages 1-2 of every view must engage on the synthetic scene
        eng = report["epipolar_engaged"]
        assert all(all(v for v in eng[st]) for st in ("stage1", "stage2")), eng
        report["tol"].update({
            "epi_mean_mm": EPI_TOL_MEAN_MM, "epi_p99_mm": EPI_TOL_P99_MM,
            "epi_max_mm": EPI_TOL_MAX_MM,
        })
    if "--costreg-bf16" in sys.argv:
        # bf16 cost-U-Net candidate (STAGETIME r4: the U-Nets are
        # HBM-bound; halving activation bytes is worth ~35 ms/map):
        # gate its eval-default flip on full-model mm deltas here
        d_cb, c_cb = run_forward(h, w, jax.lax.Precision.DEFAULT, True,
                                 costreg_bf16=True)
        report["depth_costreg_bf16_vs_default_mm"] = stats(d_cb, d_def)
        report["conf_costreg_bf16_vs_default"] = stats(c_cb, c_def)
    if "--feature-bf16" in sys.argv:
        # bf16 feature-FPN candidate (STAGETIME r4: the FPN is HBM-bound
        # at 95% of its fp32 byte roofline): outputs cast back to fp32
        # at the warp interface; gate its eval-default flip on
        # full-model mm deltas here
        d_fb, c_fb = run_forward(h, w, jax.lax.Precision.DEFAULT, True,
                                 feature_bf16=True)
        report["depth_feature_bf16_vs_default_mm"] = stats(d_fb, d_def)
        report["conf_feature_bf16_vs_default"] = stats(c_fb, c_def)

    print(json.dumps(report, indent=1))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)

    gp = report["geometry_precision_px"]
    assert gp["warp_coords_px"] <= TOL_GEOM_PX, gp
    assert gp["rect_grid_px"] <= TOL_GEOM_PX, gp
    s = report["depth_default_vs_highest_mm"]
    assert s["mean"] <= TOL_MEAN_MM, s
    assert s["p99"] <= TOL_P99_MM, s
    assert s["max"] <= TOL_MAX_MM, s
    assert report["conf_default_vs_highest"]["mean"] <= TOL_CONF_MEAN
    # the Pallas HIGHEST path must track the XLA reference semantics to
    # fp32 round-off through the soft argmax (same tolerances apply with
    # huge margin; asserted to catch kernel-geometry regressions)
    s = report["depth_pallas_vs_xla_mm"]
    assert s["mean"] <= TOL_MEAN_MM and s["max"] <= TOL_MAX_MM, s
    if "depth_epipolar_vs_default_mm" in report:
        s = report["depth_epipolar_vs_default_mm"]
        assert s["mean"] <= EPI_TOL_MEAN_MM, s
        assert s["p99"] <= EPI_TOL_P99_MM, s
        assert s["max"] <= EPI_TOL_MAX_MM, s
    # the bf16 eval defaults (cost U-Nets, feature FPN) hold to the same
    # bar as the Pallas DEFAULT-precision mode — depth AND confidence
    for key in ("costreg_bf16", "feature_bf16"):
        if f"depth_{key}_vs_default_mm" not in report:
            continue
        s = report[f"depth_{key}_vs_default_mm"]
        assert s["mean"] <= TOL_MEAN_MM, (key, s)
        assert s["p99"] <= TOL_P99_MM, (key, s)
        assert s["max"] <= TOL_MAX_MM, (key, s)
        c = report[f"conf_{key}_vs_default"]
        assert c["mean"] <= TOL_CONF_MEAN, (key, c)
    print("numerics check OK")


if __name__ == "__main__":
    main()
