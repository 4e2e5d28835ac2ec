"""COMPILED (non-interpret) smoke of every Pallas warp kernel tier.

Round-3's chip crash (`'tpu.enqueue_dma' op DMA source and target shape
mismatch`, CHIPRUN_r3a.log) happened because a backward kernel was built
with a different row tier than its scratch buffer — a combination the
interpret-mode tests never exercised compiled.  This tool force-selects
EVERY tier the forward can route to — (C_WIN_FAST, MIN_ROWS_FAST) /
(C_WIN_FAST, default rows) / (C_WIN, default rows) — for each cascade
channel width, bypassing the `_span_ok` lax.cond so nothing can silently
fall back, and runs forward + grad(src) + grad(ref) compiled on the real
device, checked against the XLA gather path.

Small shapes => fast compiles: the point is to catch Mosaic lowering
crashes and fwd/bwd tier mismatches BEFORE a full-res run burns an hour
of tunnel time.  Exit code != 0 on any failure.

Usage: python tools/tier_smoke.py [--interpret]
Writes TIER_SMOKE.json: [{c, tier, fwd_err, gsrc_err, gref_err, ok}].
"""

from __future__ import annotations

# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dmvsnet_tpu.core import geometry  # noqa: E402
from dmvsnet_tpu.ops import warp as warp_ops  # noqa: E402
from dmvsnet_tpu.ops.pallas import warp_correlate as wc  # noqa: E402
from dmvsnet_tpu.utils import synthetic  # noqa: E402


def run_combo(c: int, cwin: int, min_rows, interpret: bool, rng):
    h, w, d = 24, 160, 4
    src = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    cams = np.stack(
        [synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2),
         synthetic.camera_stack(1.2 * w, 1.2 * w, w / 2, h / 2,
                                tx=-4.0, angle=0.008)]
    )
    fused = geometry.fuse_projection(jnp.asarray(cams[None]))[0]
    rel = geometry.relative_projection(fused[1], fused[0])
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 700, (d, h, w)).astype(np.float32), axis=0)
    )
    cot = jnp.asarray(rng.normal(size=(d, h, w, 2)).astype(np.float32))

    # the tier must actually be legal for this geometry, else the kernel
    # windows would (correctly) zero out-of-window taps and the XLA
    # comparison would be meaningless
    ok = bool(wc._span_ok(rel, dv, h, w, c, cwin, min_rows))
    if not ok:
        raise RuntimeError(
            f"span check rejects c={c} cwin={cwin} mr={min_rows} — "
            "smoke geometry needs shrinking"
        )

    def loss_pallas(s, r):
        ref_t = wc._tile_ref(r)
        out = wc._corr_view_tiled_diff(interpret, cwin, min_rows, s, ref_t, rel, dv)
        return jnp.sum(wc._untile_out(out, h, w) * cot)

    def fwd_pallas(s, r):
        ref_t = wc._tile_ref(r)
        out = wc._corr_view_tiled_diff(interpret, cwin, min_rows, s, ref_t, rel, dv)
        return wc._untile_out(out, h, w)

    def fwd_xla(s, r):
        px, py = geometry.plane_sweep_coords(rel[None], dv[None], h, w)
        warped = jax.vmap(warp_ops.bilinear_sample)(s[None], px, py)
        return warp_ops.group_correlation(warped, r[None])[0]

    def loss_xla(s, r):
        return jnp.sum(fwd_xla(s, r) * cot)

    out_p = np.asarray(jax.jit(fwd_pallas)(src, ref))
    out_x = np.asarray(jax.jit(fwd_xla)(src, ref))
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(src, ref)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(src, ref)
    fwd_err = float(np.abs(out_p - out_x).max())
    gsrc_err = float(np.abs(np.asarray(gp[0]) - np.asarray(gx[0])).max())
    gref_err = float(np.abs(np.asarray(gp[1]) - np.asarray(gx[1])).max())
    return fwd_err, gsrc_err, gref_err


def main():
    interpret = "--interpret" in sys.argv
    rng = np.random.default_rng(0)
    rows = []
    failed = False
    for c in (8, 16, 32):
        combos = [("wide", wc.C_WIN, None), ("fast", wc.C_WIN_FAST, None)]
        if wc._row_group(c, wc.MIN_ROWS_FAST)[1] < wc._row_group(c)[1]:
            combos.append(("fast12", wc.C_WIN_FAST, wc.MIN_ROWS_FAST))
        for name, cwin, mr in combos:
            t0 = time.time()
            try:
                fe, gs, gr = run_combo(c, cwin, mr, interpret, rng)
                ok = fe < 5e-4 and gs < 5e-4 and gr < 5e-4
                rows.append({"c": c, "tier": name, "fwd_err": fe,
                             "gsrc_err": gs, "gref_err": gr, "ok": ok,
                             "s": round(time.time() - t0, 1)})
                print(f"c={c:2d} {name:7s} fwd={fe:.2e} gsrc={gs:.2e} "
                      f"gref={gr:.2e} {'OK' if ok else 'FAIL'} "
                      f"({time.time()-t0:.0f}s)", flush=True)
                failed |= not ok
            except Exception as e:  # lowering/Mosaic crash = the bug class
                rows.append({"c": c, "tier": name, "ok": False,
                             "error": f"{type(e).__name__}: {e}"[:500]})
                print(f"c={c:2d} {name:7s} CRASH {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                failed = True
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TIER_SMOKE.json"), "w") as f:
        json.dump(rows, f, indent=1)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
