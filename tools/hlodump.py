"""Dump + summarize the optimized HLO of the composed train step.

The composed step runs ~12x slower than the sum of its parts on v5e
while XLA's own memory_analysis plans only ~6 GB at batch 1 (so it is
NOT an HBM-capacity cliff).  This tool extracts what the compiler
actually did with the composed program:

  * every convolution's operand/result shapes AND layouts,
  * the byte-heaviest instructions (padded-tile bytes, not logical),
  * all copy / transpose / convert instructions above a size floor
    (layout-assignment relayouts show up as copies with mismatched
    operand/result layouts).

TPU tiling pads the minor-most dim to 128 and the second-minor to 8
(fp32), so an f32[...,H,W,8] tensor laid out {3,2,1,0} carries a 16x
physical inflation: 'pad_x' below is physical/logical bytes.

Usage: python tools/hlodump.py [--train|--eval] [--batch=N] [--remat]
       [--out=/root/repo/HLODUMP_train.txt]
Writes the full HLO text to --out and a JSON summary next to it.
"""

from __future__ import annotations

# run directly (python tools/x.py): make the repo root importable
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import re

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8,
               "f64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]\{([\d,]*)(?::T\(([\dx,()]+)\))?[^}]*\}")


def parse_shape(text):
    """-> (dtype, dims, minor_to_major, tile) or None."""
    m = SHAPE_RE.match(text)
    if not m:
        return None
    dtype = m.group(1)
    dims = [int(d) for d in m.group(2).split(",") if d] if m.group(2) else []
    mtm = [int(d) for d in m.group(3).split(",") if d] if m.group(3) else []
    return dtype, dims, mtm, m.group(4)


def physical_bytes(dtype, dims, mtm, tile):
    """Physical bytes under TPU tiling: minor dim padded to 128, second-
    minor to 8 (fp32; 16 for bf16 via (8,128,2) packing — approximated
    as 8 here, an under-estimate)."""
    if dtype not in DTYPE_BYTES or not dims:
        return 0, 0
    logical = DTYPE_BYTES[dtype]
    for d in dims:
        logical *= d
    if not mtm or len(mtm) != len(dims):
        return logical, logical
    order = [dims[i] for i in mtm]  # order[0] = minor dim
    padded = list(dims)
    pm = dict(zip(mtm, range(len(mtm))))
    phys = DTYPE_BYTES[dtype]
    for i, d in enumerate(dims):
        pos = pm[i] if i in pm else None
        dd = d
        if pos == 0:
            dd = -(-d // 128) * 128
        elif pos == 1:
            dd = -(-d // 8) * 8
        phys *= dd
    return logical, phys


def summarize(hlo: str, top=40):
    rows = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\w+\[[^ ]*)", line)
        if not m:
            continue
        name = m.group(1)
        ps = parse_shape(m.group(2))
        if not ps:
            continue
        dtype, dims, mtm, tile = ps
        logical, phys = physical_bytes(dtype, dims, mtm, tile)
        if phys < 16 << 20:  # 16 MB floor
            continue
        opm = re.search(r"= \S+ (\w+)\(", line)
        op = opm.group(1) if opm else "?"
        rows.append({
            "name": name, "op": op, "dtype": dtype, "dims": dims,
            "minor_to_major": mtm, "logical_mb": round(logical / 2**20, 1),
            "physical_mb": round(phys / 2**20, 1),
            "pad_x": round(phys / logical, 2) if logical else None,
        })
    rows.sort(key=lambda r: -r["physical_mb"])
    convs = [r for r in rows if r["op"] in ("convolution", "custom-call")]
    relayout = [r for r in rows if r["op"] in ("copy", "transpose", "bitcast")]
    padded = [r for r in rows if (r["pad_x"] or 1) > 2.0]
    return {
        "total_instructions_ge16mb": len(rows),
        "top_by_physical": rows[:top],
        "padded_over_2x": padded[:top],
        "relayout_copies": relayout[:top],
        "convolutions": convs[:top],
    }


def main():
    batch = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--batch=")), 1))
    remat = "--remat" in sys.argv
    train = "--eval" not in sys.argv
    out_path = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("--out=")),
                    f"/root/repo/HLODUMP_{'train' if train else 'eval'}.txt")

    from dmvsnet_tpu.engine.state import create_train_state, make_lr_schedule
    from dmvsnet_tpu.engine.steps import make_train_step
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.ops.pallas import warp_correlate
    from dmvsnet_tpu.utils import synthetic

    warp_correlate.MATMUL_PRECISION = jax.lax.Precision.DEFAULT
    if train:
        model = MVSNet(ndepths=(48, 32, 8), depth_interval_ratio=(4, 2, 1),
                       inverse_depth=True, use_pallas_warp=True, remat=remat)
        b = jax.tree_util.tree_map(jnp.asarray, synthetic.make_batch(
            batch=batch, n_views=5, height=512, width=640, n_depths=192))
        lr = make_lr_schedule(1e-3, steps_per_epoch=1000)
        state = create_train_state(model, jax.random.PRNGKey(0), b, lr)
        step = make_train_step(lr_schedule=lr, jit=False)

        def fn(state, b):
            s2, scalars, _ = step(state, b)
            return s2

        lowered = jax.jit(fn, donate_argnums=(0,)).lower(state, b)
    else:
        model = MVSNet(ndepths=(48, 32, 8), depth_interval_ratio=(4, 2, 1),
                       inverse_depth=True, use_pallas_warp=True,
                       use_epipolar_warp=True,
                       costreg_dtype=jnp.bfloat16, feature_dtype=jnp.bfloat16)
        b = jax.tree_util.tree_map(jnp.asarray, synthetic.make_batch(
            batch=batch, n_views=5, height=864, width=1152, n_depths=192))
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), b["imgs"], b["proj_matrices"],
            b["depth_values"])

        def fn(variables, imgs, proj, dv):
            out = model.apply(variables, imgs, proj, dv, train=False)
            return out["depth"], out["photometric_confidence"]

        lowered = jax.jit(fn).lower(variables, b["imgs"], b["proj_matrices"],
                                    b["depth_values"])

    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(hlo)
    summary = summarize(hlo)
    try:
        ma = compiled.memory_analysis()
        summary["memory_analysis_gb"] = {
            "temp": round(ma.temp_size_in_bytes / 1e9, 2),
            "args": round(ma.argument_size_in_bytes / 1e9, 2),
            "output": round(ma.output_size_in_bytes / 1e9, 2),
        }
    except Exception:
        pass
    jpath = out_path.rsplit(".", 1)[0] + "_summary.json"
    with open(jpath, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: (v if not isinstance(v, list) else v[:8])
                      for k, v in summary.items()}, indent=1))
    print(f"wrote {out_path} and {jpath}")


if __name__ == "__main__":
    main()
