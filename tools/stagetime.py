"""Per-component timing breakdown of the DTU-eval forward pass.

Times each piece of the cascade (FeatureNet, per-stage warp+correlate,
cost regularization, heads, samplers) as its OWN amortized in-jit loop
at the real DTU shapes (864x1152, 5 views, ndepths 48/32/8), so the
whole-model time (bench.py) can be attributed stage by stage.

Methodology matches bench.py: K calls inside one jit dispatch (fori_loop
whose carry perturbs an input, so no iteration is CSE'd), scalar fetched
once — required because dispatches ride a ~25 ms tunnel and
block_until_ready lies on this harness.

Usage:  python tools/stagetime.py [--exact] [--iters=N] [--only=warp]
Writes STAGETIME.json (list of {name, ms, flops, tflops_s}) and prints a
table.
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

from dmvsnet_tpu.core import sampling  # noqa: E402
from dmvsnet_tpu.models import depth_net  # noqa: E402
from dmvsnet_tpu.models.cost_reg import CostRegNet, CostRegNetRefine  # noqa: E402
from dmvsnet_tpu.models.feature_net import FeatureNet  # noqa: E402
from dmvsnet_tpu.ops import warp as warp_ops  # noqa: E402
from dmvsnet_tpu.utils import synthetic  # noqa: E402

H, W, V = 864, 1152, 5
NDEPTHS = (48, 32, 8)
RATIOS = (4.0, 2.0, 1.0)
CHANNELS = (32, 16, 8)


def time_amortized(fn, args, iters: int) -> float:
    """Seconds per call of fn(*args), amortized over one dispatch."""

    @jax.jit
    def many(n, *args):
        def body(i, acc):
            out = fn(args[0] + acc * 1e-20, *args[1:])
            leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out)]
            return acc + sum(leaves)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(1), *args)))  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(many(jnp.int32(iters), *args)))
    return (time.perf_counter() - t0) / iters, compile_s


# v5e peaks for the roofline columns: 197 TF/s bf16 MXU, 819 GB/s HBM.
# fp32 matmuls decompose into multiple bf16 passes, so fp32-heavy stages
# cannot reach PEAK_TF — sol_pct is an upper-bound optimism for those.
PEAK_TF = 197e12
PEAK_BW = 819e9


def costs_of(fn, args) -> tuple[float, float]:
    """(flops, bytes_accessed) from XLA's cost model."""
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return (float(a.get("flops", float("nan"))),
                float(a.get("bytes accessed", float("nan"))))
    except Exception:
        return float("nan"), float("nan")


def pallas_warp_cost(proj2, samples, sh, sw, c):
    """Analytic (flops, bytes) of the Pallas warp at these inputs: picks
    each view's ACTUAL tier via the same `_span_ok` routing the compiled
    cond uses (inputs are concrete here), then sums
    `warp_correlate.analytic_cost`.  XLA's cost model can't do this — it
    sums both cond branches and sees zero inside the custom call
    (VERDICT r3 "1570% SoL")."""
    from dmvsnet_tpu.core import geometry
    from dmvsnet_tpu.ops.pallas import warp_correlate as wc

    dpl = samples.shape[1]
    dv0 = samples[0]
    fused = geometry.fuse_projection(proj2)[0]
    fl = by = 0.0
    row_tiered = wc._row_group(c, wc.MIN_ROWS_FAST)[1] < wc._row_group(c)[1]
    for v in range(1, proj2.shape[1]):
        rel = geometry.relative_projection(fused[v], fused[0])
        if row_tiered and bool(wc._span_ok(
                rel, dv0, sh, sw, c, wc.C_WIN_FAST, wc.MIN_ROWS_FAST)):
            tier = (wc.C_WIN_FAST, wc.MIN_ROWS_FAST)
        elif bool(wc._span_ok(rel, dv0, sh, sw, c, wc.C_WIN_FAST)):
            tier = (wc.C_WIN_FAST, None)
        elif bool(wc._span_ok(rel, dv0, sh, sw, c, wc.C_WIN)):
            tier = (wc.C_WIN, None)
        else:  # XLA fallback branch: no analytic model, skip override
            return None
        f, b = wc.analytic_cost(sh, sw, c, dpl, *tier)
        fl += f
        by += b
    return fl, by


def prefix_main(iters: int):
    """Time the REAL composed model truncated after k stages (and the
    feature net alone) to localize inter-stage overhead the isolated
    component timings can't see."""
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.utils import synthetic

    batch = synthetic.make_batch(batch=1, n_views=V, height=H, width=W, n_depths=192)
    imgs = jnp.asarray(batch["imgs"])
    proj = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])

    full = MVSNet(ndepths=NDEPTHS, depth_interval_ratio=RATIOS,
                  inverse_depth=True, use_pallas_warp=True)
    # jitted init: one cached compile instead of eager per-op dispatches
    variables = jax.jit(full.init)(jax.random.PRNGKey(0), imgs, proj, dv)

    results = []
    # feature net alone, as composed (B*V batched call)
    fnet = FeatureNet(8, name="feature")
    fvars = {"params": variables["params"]["feature"],
             "batch_stats": variables["batch_stats"]["feature"]}

    def feat_fn(imgs):
        return fnet.apply(fvars, imgs.reshape(V, H, W, 3))

    dt, _ = time_amortized(feat_fn, (imgs,), iters)
    results.append(("features", dt * 1e3))
    print(f"prefix features: {dt*1e3:9.3f} ms", flush=True)

    ks = [float(x) for x in next(
        (a.split("=")[1] for a in sys.argv if a.startswith("--ks=")), "1,2,3"
    ).split(",")]
    for k in ks:
        model = MVSNet(ndepths=NDEPTHS, depth_interval_ratio=RATIOS,
                       inverse_depth=True, use_pallas_warp=True, run_stages=k)

        def fwd(imgs, model=model):
            out = model.apply(variables, imgs, proj, dv, train=False)
            if "partial" in out:
                return out["partial"]
            return out["depth"], out["photometric_confidence"]

        dt, compile_s = time_amortized(fwd, (imgs,), iters)
        results.append((f"stages<={k}", dt * 1e3))
        print(f"prefix stages<={k}: {dt*1e3:9.3f} ms   (compile {compile_s:.1f}s)",
              flush=True)
    prev = results[0][1]
    for name, ms in results[1:]:
        print(f"  marginal {name}: {ms - prev:9.3f} ms")
        prev = ms
    with open("/root/repo/STAGETIME_prefix.json", "w") as f:
        json.dump([{"name": n, "ms": round(m, 3)} for n, m in results], f, indent=1)


def grad_main(iters: int):
    """Per-component fwd+bwd timing at the TRAIN recipe shapes (512x640,
    batch 2, 5 views — reference scripts/train.sh): BENCH_TRAIN_r04
    measured 7.6 s/step where composition of forwards predicts ~1 s, so
    the backward of SOME component is pathological.  Times jax.grad of a
    scalar through each piece in isolation; writes STAGETIME_grad.json."""
    from dmvsnet_tpu.models import MVSNet
    from dmvsnet_tpu.ops.pallas import aggregate_cost_volume_pallas

    th, tw, b, v = 512, 640, 2, 5
    key = jax.random.PRNGKey(0)
    batch = synthetic.make_batch(batch=b, n_views=v, height=th, width=tw,
                                 n_depths=192)
    proj = {k: jnp.asarray(x) for k, x in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])
    entries = []

    def add(name, fn, args, it=iters):
        dt, compile_s = time_amortized(fn, args, it)
        entries.append({"name": name, "ms": round(dt * 1e3, 3)})
        print(f"{name:36s} {dt*1e3:9.3f} ms   (compile {compile_s:.1f}s)",
              flush=True)

    # feature net fwd vs fwd+bwd
    imgs = jax.random.normal(key, (b * v, th, tw, 3), jnp.float32)
    fnet = FeatureNet(8)
    fvars = fnet.init(key, imgs[:1])

    def feat_loss(imgs):
        out, _ = fnet.apply(fvars, imgs, True, mutable=["batch_stats"])
        return sum(jnp.sum(o) for o in out.values())

    add("train_feature_fwd", lambda x: feat_loss(x), (imgs,))
    add("train_feature_fwdbwd", jax.grad(feat_loss), (imgs,))

    depth_interval = (dv[0, -1] - dv[0, 0]) / dv.shape[1]
    for s in range(3):
        stage = f"stage{s+1}"
        scale = 2 ** (2 - s)
        sh, sw, c, d = th // scale, tw // scale, CHANNELS[s], NDEPTHS[s]
        feats = [jax.random.normal(jax.random.PRNGKey(i), (b, sh, sw, c),
                                   jnp.float32) for i in range(v)]
        p2 = proj[stage]
        if s == 0:
            samples, _ = sampling.stage1_samples(dv, d, sh, sw, inverse=True)
        else:
            mid = jnp.full((b, sh, sw), float(dv[0, dv.shape[1] // 2]))
            samples, _ = sampling.cascade_samples(
                mid, d, jnp.float32(RATIOS[s]) * depth_interval, inverse=True)
        samples = jax.block_until_ready(samples)

        def warp_loss(f0, *rest, p2=p2, samples=samples):
            return jnp.sum(aggregate_cost_volume_pallas([f0, *rest], p2, samples))

        add(f"train_warp_{stage}_fwd", warp_loss, tuple(feats))
        add(f"train_warp_{stage}_fwdbwd",
            jax.grad(warp_loss, argnums=tuple(range(v))), tuple(feats))

        dv4 = jnp.broadcast_to(samples[:, :4], (b, 4, sh, sw))

        def warp_ref_loss(f0, *rest, p2=p2, dv4=dv4):
            return jnp.sum(aggregate_cost_volume_pallas([f0, *rest], p2, dv4))

        add(f"train_warp_{stage}_refine_fwdbwd",
            jax.grad(warp_ref_loss, argnums=tuple(range(v))), tuple(feats),
            it=max(2, iters // 2))

        cost = jax.random.normal(key, (b, d, sh, sw, 2), jnp.float32)
        reg = CostRegNet(8)
        rv = reg.init(key, cost)

        def reg_loss(cost, rv=rv, reg=reg):
            return jnp.sum(reg.apply(rv, cost, True,
                                     mutable=["batch_stats"])[0])

        add(f"train_costreg_{stage}_fwdbwd", jax.grad(reg_loss), (cost,))

        cost4 = jax.random.normal(key, (b, 4, sh, sw, 2), jnp.float32)
        regr = CostRegNetRefine(8)
        rvr = regr.init(key, cost4)

        def regr_loss(cost4, rvr=rvr, regr=regr):
            return jnp.sum(regr.apply(rvr, cost4, True,
                                      mutable=["batch_stats"])[0])

        add(f"train_costreg_refine_{stage}_fwdbwd", jax.grad(regr_loss),
            (cost4,), it=max(2, iters // 2))

    total = sum(e["ms"] for e in entries)
    print(f"{'SUM':36s} {total:9.3f} ms")
    with open("/root/repo/STAGETIME_grad.json", "w") as f:
        json.dump(entries, f, indent=1)


def main():
    iters = int(next((a.split("=")[1] for a in sys.argv if a.startswith("--iters=")), 12))
    only = next((a.split("=")[1] for a in sys.argv if a.startswith("--only=")), "")
    if "--grad" in sys.argv:
        if "--exact" not in sys.argv:
            from dmvsnet_tpu.ops.pallas import warp_correlate

            warp_correlate.MATMUL_PRECISION = jax.lax.Precision.DEFAULT
        grad_main(iters)
        return
    if "--prefix" in sys.argv:
        if "--exact" not in sys.argv:
            from dmvsnet_tpu.ops.pallas import warp_correlate

            warp_correlate.MATMUL_PRECISION = jax.lax.Precision.DEFAULT
        prefix_main(iters)
        return
    if "--exact" not in sys.argv:
        from dmvsnet_tpu.ops.pallas import warp_correlate

        warp_correlate.MATMUL_PRECISION = jax.lax.Precision.DEFAULT
    from dmvsnet_tpu.ops.pallas import aggregate_cost_volume_pallas

    key = jax.random.PRNGKey(0)
    batch = synthetic.make_batch(batch=1, n_views=V, height=H, width=W, n_depths=192)
    proj = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()}
    dv = jnp.asarray(batch["depth_values"])

    entries = []

    def add(name, fn, args, it=iters, cost_override=None, default=None):
        if only and only not in name:
            return
        fl, by = cost_override if cost_override else costs_of(fn, args)
        dt, compile_s = time_amortized(fn, args, it)
        tf = fl / dt / 1e12 if fl == fl else float("nan")
        # roofline: the faster-of-two-limits time this stage COULD take,
        # which limit binds, and how close the measurement is to it
        t_mxu, t_hbm = fl / PEAK_TF, by / PEAK_BW
        roof_s = max(t_mxu, t_hbm)
        bound = "mxu" if t_mxu >= t_hbm else "hbm"
        sol = roof_s / dt if roof_s == roof_s and dt > 0 else float("nan")
        # default_path: entries composing the shipped forward (bench.py
        # sums only these for stage_ms); A/B alternates are tagged False.
        # Callers override via `default=` where name patterns lie (the
        # shipped eval warp is EPIPOLAR at stages 1-2 since r4).
        if default is None:
            default = not ("warp_xla" in name or "warp_epi" in name
                           or "folded" in name or "unfolded" in name
                           or "bf16" in name or "costreg_part" in name)
        entries.append({"name": name, "ms": round(dt * 1e3, 3),
                        "flops": fl, "tflops_s": round(tf, 2),
                        "bytes": by, "gb_s": round(by / dt / 1e9, 1) if by == by else None,
                        "bound": bound, "roofline_ms": round(roof_s * 1e3, 3),
                        "sol_pct": round(sol * 100, 1) if sol == sol else None,
                        "default_path": bool(default)})
        print(f"{name:28s} {dt*1e3:9.3f} ms   {fl/1e9 if fl==fl else 0:9.2f} GF "
              f"{tf:7.2f} TF/s  {by/1e9 if by==by else 0:7.2f} GB "
              f"{bound}-bound {sol*100 if sol==sol else 0:5.1f}% SoL  "
              f"(compile {compile_s:.1f}s)", flush=True)

    # --- FeatureNet (unfolded default since r4; folded A/B alternate) ---
    imgs = jax.random.normal(key, (V, H, W, 3), jnp.float32)
    fnet = FeatureNet(8)
    fvars = fnet.init(key, imgs[:1])

    def feat_fn(imgs):
        return fnet.apply(fvars, imgs)

    add("feature_net(5 views)", feat_fn, (imgs,), default=False)  # fp32 A/B
    fnet_f = FeatureNet(8, fold_level0=True)

    def feat_fn_f(imgs):
        return fnet_f.apply(fvars, imgs)

    add("feature_net_folded", feat_fn_f, (imgs,), it=max(2, iters // 2))
    fnet_h = FeatureNet(8, dtype=jnp.bfloat16)

    def feat_fn_h(imgs):
        return fnet_h.apply(fvars, imgs)

    # shipped eval feature net is bf16 (feature_dtype auto on TPU)
    add("feature_net_bf16", feat_fn_h, (imgs,), it=max(2, iters // 2),
        default=True)

    # --- per-stage pieces ---
    depth_interval = (dv[0, -1] - dv[0, 0]) / dv.shape[1]
    for s in range(3):
        stage = f"stage{s+1}"
        scale = 2 ** (2 - s)
        sh, sw, c, d = H // scale, W // scale, CHANNELS[s], NDEPTHS[s]
        feats = [jax.random.normal(jax.random.PRNGKey(i), (1, sh, sw, c), jnp.float32)
                 for i in range(V)]
        p2 = proj[stage]

        if s == 0:
            samples, interval = sampling.stage1_samples(dv, d, sh, sw, inverse=True)
        else:
            mid = jnp.full((1, sh // 2, sw // 2), float(dv[0, dv.shape[1] // 2]))
            samples, interval = sampling.cascade_samples(
                mid, d, jnp.float32(RATIOS[s]) * depth_interval, inverse=True)

            def samp_fn(mid, d=d, s=s, sh=sh, sw=sw):
                out, _ = sampling.cascade_samples(
                    mid, d, jnp.float32(RATIOS[s]) * depth_interval, inverse=True)
                return sampling.upsample_depth_samples(out, sh, sw)

            add(f"sampling_{stage}", samp_fn, (mid,))
            samples = sampling.upsample_depth_samples(samples, sh, sw)
        samples = jax.block_until_ready(samples)

        def warp_fn(f0, *rest, p2=p2, samples=samples):
            return aggregate_cost_volume_pallas([f0, *rest], p2, samples)

        # shipped routing (mvsnet.py epipolar_main_stages, measured r5):
        # main pass epipolar at s1-2, 2-D kernel at s3
        add(f"warp_{stage} D={d}", warp_fn, tuple(feats),
            cost_override=pallas_warp_cost(p2, samples, sh, sw, c),
            default=(s == 2))

        def warp_xla_fn(f0, *rest, p2=p2, samples=samples):
            return warp_ops.aggregate_cost_volume([f0, *rest], p2, samples)

        # the XLA-gather A/B row costs ~30 min of compile at full res for
        # a path that never ships (its r4/r5 numbers are on record:
        # 496/1794/779 ms) — opt-in so default stagetime fits its timeout
        if "--xla-rows" in sys.argv:
            add(f"warp_xla_{stage} D={d}", warp_xla_fn, tuple(feats),
                it=max(2, iters // 4))

        from dmvsnet_tpu.ops.pallas import aggregate_cost_volume_epipolar

        def warp_epi_fn(f0, *rest, p2=p2, samples=samples):
            return aggregate_cost_volume_epipolar([f0, *rest], p2, samples)

        add(f"warp_epi_{stage} D={d}", warp_epi_fn, tuple(feats),
            default=(s < 2))  # shipped: epipolar main pass at s1-2 only

        dv4 = jnp.broadcast_to(samples[:, :4], (1, 4, sh, sw))

        def warp_ref_fn(f0, *rest, p2=p2, dv4=dv4):
            return aggregate_cost_volume_pallas([f0, *rest], p2, dv4)

        add(f"warp_{stage}_refine D=4", warp_ref_fn, tuple(feats),
            cost_override=pallas_warp_cost(p2, dv4, sh, sw, c))

        def warp_epi_ref_fn(f0, *rest, p2=p2, dv4=dv4):
            return aggregate_cost_volume_epipolar([f0, *rest], p2, dv4)

        add(f"warp_epi_{stage}_refine D=4", warp_epi_ref_fn, tuple(feats),
            default=False)  # A/B: refine fans ship on the 2-D kernel (r5)

        cost = jax.random.normal(key, (1, d, sh, sw, 2), jnp.float32)
        reg = CostRegNet(8)
        rv = reg.init(key, cost)

        def reg_fn(cost, rv=rv, reg=reg):
            return reg.apply(rv, cost)

        add(f"costreg_{stage} D={d}", reg_fn, (cost,), default=False)
        # shipped eval cost U-Nets are bf16 (costreg_dtype auto on TPU)
        reg_h = CostRegNet(8, dtype=jnp.bfloat16)
        rvh = reg_h.init(key, cost)

        def reg_fn_h(cost, rv=rvh, reg=reg_h):
            return reg.apply(rv, cost)

        add(f"costreg_bf16_{stage}", reg_fn_h, (cost,), default=True)
        if s == 2:  # folded-path A/B at the stage the fold activates
            reg_u = CostRegNet(8, fold_level0=False)

            def reg_fn_u(cost, rv=rv, reg=reg_u):
                return reg.apply(rv, cost)

            add(f"costreg_unfolded_{stage}", reg_fn_u, (cost,),
                it=max(2, iters // 2))

        cost4 = jax.random.normal(key, (1, 4, sh, sw, 2), jnp.float32)
        regr = CostRegNetRefine(8)
        rvr = regr.init(key, cost4)

        def regr_fn(cost4, rvr=rvr, regr=regr):
            return regr.apply(rvr, cost4)

        add(f"costreg_refine_{stage}", regr_fn, (cost4,), default=False)
        regr_h = CostRegNetRefine(8, dtype=jnp.bfloat16)
        rvrh = regr_h.init(key, cost4)

        def regr_fn_h(cost4, rvr=rvrh, regr=regr_h):
            return regr.apply(rvr, cost4)

        add(f"costreg_refine_bf16_{stage}", regr_fn_h, (cost4,),
            default=True)
        if s == 2:  # refine fold A/B at full res (r2: 37 ms @ 1.5 TF/s)
            regr_u = CostRegNetRefine(8, fold_level0=False)

            def regr_fn_u(cost4, rvr=rvr, regr=regr_u):
                return regr.apply(rvr, cost4)

            add(f"costreg_refine_unfolded_{stage}", regr_fn_u, (cost4,),
                it=max(2, iters // 2))

        creg = jax.random.normal(key, (1, d, sh, sw, 4), jnp.float32)

        def head_fn(creg, samples=samples, interval=interval):
            return depth_net.forward(creg, samples, interval)

        add(f"head_{stage} D={d}", head_fn, (creg,))

        creg4 = jax.random.normal(key, (1, 4, sh, sw, 4), jnp.float32)

        def headr_fn(creg4, dv4=dv4, interval=interval):
            return depth_net.refine(creg4, dv4, interval)

        add(f"head_refine_{stage}", headr_fn, (creg4,))

    total = sum(e["ms"] for e in entries)
    print(f"{'SUM of parts':28s} {total:9.3f} ms")
    if only:
        # filtered runs are probes; don't clobber the full artifact
        print("(--only filter active: STAGETIME.json not rewritten)")
        return
    # git-stamped so bench.py can refuse stale attribution (VERDICT r3 #6)
    import subprocess
    try:
        git = subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        git = ""
    with open("/root/repo/STAGETIME.json", "w") as f:
        json.dump({"git": git, "ts": time.time(), "entries": entries}, f, indent=1)


if __name__ == "__main__":
    main()
