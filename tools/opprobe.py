"""Micro-probe for the round-3 conv hot spots (costreg stage3 / refine3,
feature net full-res convs).

STAGETIME.json shows costreg_stage3 at 3.2 TF/s and feature at 2.9 TF/s —
far below BOTH rooflines (flop limit ~5 ms, byte limit ~5 ms, measured
60 ms / 43 ms).  This probe times each sub-block in isolation and layout
variants (ddense vs direct conv3d, s2d-folded 2x, bf16, bn on/off) so the
rework targets the actual pathology rather than the aggregate.

Usage: python tools/opprobe.py [--only=substr] [--iters=N]
Writes OPPROBE.json.
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

from dmvsnet_tpu.models import blocks  # noqa: E402

H, W = 864, 1152


def time_amortized(fn, args, iters: int):
    @jax.jit
    def many(n, *args):
        def body(i, acc):
            out = fn(args[0] + acc * 1e-20, *args[1:])
            leaves = [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(out)]
            return acc + sum(leaves)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(1), *args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(iters), *args)))
    return (time.perf_counter() - t0) / iters, compile_s


def costs_of(fn, args):
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return (float(a.get("flops", float("nan"))),
                float(a.get("bytes accessed", float("nan"))))
    except Exception:
        return float("nan"), float("nan")


def main():
    iters = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--iters=")), 12))
    only = next((a.split("=")[1] for a in sys.argv
                 if a.startswith("--only=")), "")
    key = jax.random.PRNGKey(0)
    entries = []

    def add(name, fn, *args, it=iters):
        if only and only not in name:
            return
        fl, by = costs_of(fn, args)
        dt, cs = time_amortized(fn, args, it)
        tf = fl / dt / 1e12
        gbs = by / dt / 1e9
        entries.append({"name": name, "ms": round(dt * 1e3, 3),
                        "flops": fl, "tflops_s": round(tf, 2),
                        "bytes": by, "gb_s": round(gbs, 1)})
        print(f"{name:42s} {dt*1e3:9.3f} ms {fl/1e9:9.2f} GF {tf:7.2f} TF/s "
              f"{by/1e9:7.2f} GB {gbs:7.1f} GB/s  (compile {cs:.1f}s)",
              flush=True)

    def conv_block(cin, cout, dims, stride=1, kernel=3, shape=None, bn=True,
                   relu=True, dtype=jnp.float32, tag=""):
        x = jax.random.normal(key, shape, jnp.float32)
        blk = blocks.ConvBlock(cout, kernel=kernel, stride=stride, dims=dims,
                               bn=bn, relu=relu, dtype=dtype)
        v = blk.init(key, x)
        add(f"conv{dims}d{tag} {cin}->{cout} s{stride} {shape}",
            lambda x, v=v, blk=blk: blk.apply(v, x), x)

    def deconv_block(cin, cout, dims, shape, dtype=jnp.float32, tag=""):
        x = jax.random.normal(key, shape, jnp.float32)
        blk = blocks.DeconvBlock(cout, kernel=3, dims=dims, dtype=dtype)
        v = blk.init(key, x)
        add(f"deconv{dims}d{tag} {cin}->{cout} {shape}",
            lambda x, v=v, blk=blk: blk.apply(v, x), x)

    # ---- costreg stage3 (D=8, full res) level-0 pieces ----
    conv_block(2, 8, 3, shape=(1, 8, H, W, 2), tag="/s3.conv0")
    conv_block(2, 8, 3, shape=(1, 8, H, W, 2), bn=False, relu=False,
               tag="/s3.conv0.raw")
    conv_block(8, 16, 3, stride=2, shape=(1, 8, H, W, 8), tag="/s3.conv1")
    deconv_block(16, 8, 3, (1, 4, H // 2, W // 2, 16), tag="/s3.deconv11")
    # prob head: ddense 8->2
    x = jax.random.normal(key, (1, 8, H, W, 8), jnp.float32)
    pc = blocks.PlainConv(2, kernel=3, dims=3, use_bias=False)
    v = pc.init(key, x)
    add("prob3d/s3 8->2 (1,8,H,W,8)", lambda x, v=v: pc.apply(v, x), x)

    # direct NDHWC conv3d for comparison (level 0)
    k3 = jax.random.normal(key, (3, 3, 3, 2, 8), jnp.float32)
    x32 = jax.random.normal(key, (1, 8, H, W, 2), jnp.float32)
    add("conv3d-direct/s3.conv0", lambda x, k=k3: jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x32)

    # the folded conv2d that ddense actually emits at level 0 (D*C=16->64)
    xf = jax.random.normal(key, (1, H, W, 16), jnp.float32)
    kf = jax.random.normal(key, (3, 3, 16, 64), jnp.float32)
    add("conv2d-folded/s3.conv0 16->64", lambda x, k=kf: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xf)
    add("conv2d-folded/s3.conv0.bf16", lambda x, k=kf: jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xf)

    # whole branches
    from dmvsnet_tpu.models.cost_reg import CostRegNetPart, CostRegNetPartRefine
    for dt, tag in ((jnp.float32, ""), (jnp.bfloat16, ".bf16")):
        x = jax.random.normal(key, (1, 8, H, W, 2), jnp.float32)
        part = CostRegNetPart(8, dtype=dt)
        v = part.init(key, x)
        add(f"costreg_part/s3{tag}", lambda x, v=v, part=part: part.apply(v, x), x)
        x4 = jax.random.normal(key, (1, 4, H, W, 2), jnp.float32)
        ref = CostRegNetPartRefine(8, dtype=dt)
        v4 = ref.init(key, x4)
        add(f"costreg_refine_part/s3{tag}",
            lambda x, v=v4, ref=ref: ref.apply(v, x), x4)

    # ---- dual-branch fusion candidates (r4): CostRegNet runs cosR_small
    # and cosR_huge as two independent 8-ch U-Nets on the SAME input.
    # Concatenating the branches channel-wise and running every conv with
    # feature_group_count=2 is one op at double the lane width with
    # IDENTICAL flops/params — worth it iff XLA lowers grouped conv well.
    # Probe all three forms at the level-0 and bottleneck shapes.
    for (cin, cout, dshape) in [
        (2, 8, (1, 8, H, W, 2)),          # level-0 (input shared verbatim)
        (32, 64, (1, 1, H // 8, W // 8, 32)),  # bottleneck
    ]:
        x1 = jax.random.normal(key, dshape, jnp.float32)
        x2 = jnp.concatenate([x1, x1], axis=-1)
        ka = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32)
        kb = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout),
                               jnp.float32)
        kcat = jnp.concatenate([ka, kb], axis=-1)  # grouped: I=cin, O=2cout
        kdense = jax.random.normal(key, (3, 3, 3, 2 * cin, 2 * cout),
                                   jnp.float32)
        dn = ("NDHWC", "DHWIO", "NDHWC")

        def two(x, ka=ka, kb=kb, dn=dn):
            a = jax.lax.conv_general_dilated(
                x, ka, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
            b = jax.lax.conv_general_dilated(
                x, kb, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
            return jnp.concatenate([a, b], axis=-1)

        add(f"dual2x/{cin}->{cout} separate", two, x1)
        add(f"dual2x/{cin}->{cout} grouped",
            lambda x, k=kcat, dn=dn: jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
                feature_group_count=2), x2)
        add(f"dual2x/{cin}->{cout} dense2x",
            lambda x, k=kdense, dn=dn: jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn), x2)

    # ---- refine3 full-res pieces ----
    conv_block(2, 8, 3, shape=(1, 4, H, W, 2), tag="/r3.conv0")
    deconv_block(16, 8, 3, (1, 2, H // 2, W // 2, 16), tag="/r3.deconv11")
    x = jax.random.normal(key, (1, 4, H, W, 8), jnp.float32)
    v = pc.init(key, x)
    add("prob3d/r3 8->2 (1,4,H,W,8)", lambda x, v=v: pc.apply(v, x), x)

    # ---- feature net full-res convs (5 views) ----
    conv_block(3, 8, 2, shape=(5, H, W, 3), tag="/f.conv0_0")
    conv_block(8, 8, 2, shape=(5, H, W, 8), tag="/f.conv0_1")
    xo = jax.random.normal(key, (5, H, W, 32), jnp.float32)
    oc = blocks.PlainConv(16, kernel=3, dims=2, use_bias=False)
    v = oc.init(key, xo)
    add("out3/f 32->16 (5,H,W,32)", lambda x, v=v: oc.apply(v, x), xo)

    # s2d-folded equivalents: same math at 1/2 res with 4x channels
    xs = jax.random.normal(key, (5, H // 2, W // 2, 12), jnp.float32)
    ks = jax.random.normal(key, (2, 2, 12, 32), jnp.float32)
    add("s2d-conv/f.conv0_0 12->32", lambda x, k=ks: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xs)
    xs8 = jax.random.normal(key, (5, H // 2, W // 2, 32), jnp.float32)
    ks8 = jax.random.normal(key, (2, 2, 32, 32), jnp.float32)
    add("s2d-conv/f.conv0_1 32->32", lambda x, k=ks8: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xs8)
    xso = jax.random.normal(key, (5, H // 2, W // 2, 128), jnp.float32)
    kso = jax.random.normal(key, (2, 2, 128, 64), jnp.float32)
    add("s2d-conv/f.out3 128->64", lambda x, k=kso: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xso)

    with open("/root/repo/OPPROBE.json", "w") as f:
        json.dump(entries, f, indent=1)


if __name__ == "__main__":
    main()
