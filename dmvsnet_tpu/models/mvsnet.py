"""The cascade dual-depth MVS network (flagship model).

Re-creates reference networks/mvsnet.py:156-260 TPU-first:

* all V views go through the feature net as ONE batched conv call
  (the reference loops views in Python, networks/mvsnet.py:199-202 —
  batching keeps the MXU fed and makes BN statistics view-global);
* 3 cascade stages at 1/4, 1/2, 1/1 resolution; each stage runs two
  passes: a D-plane sweep (CostRegNet) and a 4-plane checkerboard refine
  (CostRegNetRefine) on the "_c" feature split;
* depth hypotheses come from `core.sampling`; the cost volume from
  `ops.warp` (XLA path) — both channels-last.

Inputs
------
imgs:           (B, V, H, W, 3) float, view 0 = reference view.
proj_matrices:  {"stage1".."stage3": (B, V, 2, 4, 4)}.
depth_values:   (B, D0) global hypothesis fan (inverse- or uniform-spaced).

Outputs: flat dict with the reference's keys ("depth",
"photometric_confidence", ...) plus per-stage dicts under "stage{i}".
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmvsnet_tpu.core import sampling
from dmvsnet_tpu.models import depth_net
from dmvsnet_tpu.models.cost_reg import AggWeightNetVolume, CostRegNet, CostRegNetRefine
from dmvsnet_tpu.models.feature_net import FeatureNet
from dmvsnet_tpu.ops import warp as warp_ops
from dmvsnet_tpu.parallel import mesh as mesh_lib


class MVSNet(nn.Module):
    ndepths: Sequence[int] = (48, 32, 8)
    depth_interval_ratio: Sequence[float] = (4.0, 2.0, 1.0)
    cr_base_channels: Sequence[int] = (8, 8, 8)
    base_channels: int = 8
    inverse_depth: bool = False
    # "variance" = unweighted view sum (the reference's shipped mode);
    # "adaptive" = per-voxel learned view weights via AggWeightNetVolume
    # (the reference constructs these nets but never calls them,
    # networks/mvsnet.py:107-108 — here the mode actually works).
    agg_mode: str = "variance"
    # Use the fused Pallas band-matmul warp kernel for cost volumes
    # (1.9-3.2x the XLA gather path on v5e).  Valid for training too: the
    # kernel has a custom VJP (adjoint Pallas kernels, gradient-parity
    # tested against the XLA path).
    use_pallas_warp: bool = False
    # EVAL-ONLY: epipolar-rectified 1-D sweeps where the pair geometry
    # admits them (ops/pallas/epipolar_sweep.py) — cuts the per-plane
    # band-matmul count ~2-3x at stages 1-2; per-(view, stage) validity
    # falls back to the 2-D kernel.  Approximate (two extra resamples);
    # ignored under train=True (no VJP on this path).
    use_epipolar_warp: bool = False
    # Per-(stage, pass) epipolar routing (only consulted when
    # use_epipolar_warp): stage indices whose MAIN / REFINE cost pass use
    # the rectified 1-D sweep; others keep the 2-D kernel.  The sweep's
    # fixed rectify/resample overhead amortizes over the plane count —
    # chip A/B (STAGETIME r5, 864x1152, ms/map): main s1 23.0 epi vs
    # 28.3 2-D, s2 34.4 vs 55.4 (epi WINS deep fans), but s3 50.2 vs
    # 35.0 and refine fans 6.3/12.0/39.7 epi vs 4.7/8.4/19.6 2-D (epi
    # LOSES shallow fans: D=8 and D=4 cannot amortize the two extra
    # full-res resamples).  Defaults = the measured winners.
    epipolar_main_stages: tuple = (0, 1)
    epipolar_refine_stages: tuple = ()
    dtype: Any = jnp.float32
    # Optional jax.sharding.Mesh with (dp, sp) axes: batch over dp, the
    # image-height axis of cost volumes over sp (GSPMD halo-exchanges the
    # 3D convs).  None = single-device / propagate-from-inputs.
    mesh: Any = None
    # Rematerialize the cost-regularization U-Nets on the backward pass
    # (jax.checkpoint): the dominant training-memory term is the per-stage
    # cost volumes + U-Net activations (B x D x H x W x C at 3 scales x 2
    # passes); remat recomputes them from the (much smaller) inputs,
    # trading ~1 extra forward of the U-Nets for several GB of HBM at the
    # 512x640 train recipe — enables larger per-chip batches.
    remat: bool = False
    # Compute dtype for the cost-regularization U-Nets only (None =
    # follow `dtype`).  The cost U-Nets are HBM-bound at 84-90% of their
    # byte roofline in fp32 (STAGETIME r4) — bf16 activations halve the
    # traffic while the fp32 BN islands and the fp32 soft-argmax heads
    # (depth_net casts its input) bound the numerics.  Flip the eval
    # default only behind the NUMERICS.json gate.
    costreg_dtype: Any = None
    # Compute dtype for the feature FPN only (None = follow `dtype`).
    # Like the cost U-Nets it is HBM-bound (95% of its fp32 byte
    # roofline, STAGETIME r4) so bf16 activations halve its traffic; the
    # extracted feature maps are cast back to fp32 at the interface so
    # warp/cost numerics see the same dtype contract either way.  Flip
    # the eval default only behind the NUMERICS.json gate
    # (depth_feature_bf16_vs_default_mm).
    feature_dtype: Any = None
    # Fold-layout override: None = each submodule's measured default
    # (feature net unfolded, cost U-Net level 0 folded); True/False forces
    # every fold switch.  Params/numerics identical either way — bench.py
    # uses fold_level0=False to count canonical FLOPs.
    fold_level0: Any = None
    # Diagnostic: stop after this many cascade stages (0 = run all).
    # Fractional values truncate MID-stage (s + 0.2 = after sampling,
    # +0.4 = after pass-1 cost, +0.6 = after CostRegNet, +0.8 = after the
    # refine cost, +0.9 = after CostRegNetRefine).  Stage scales stay
    # those of the full ndepths config, so timing a truncated apply
    # isolates per-step cost inside the composed graph.
    run_stages: float = 0

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,
        proj_matrices: dict[str, jnp.ndarray],
        depth_values: jnp.ndarray,
        train: bool = False,
    ) -> dict[str, Any]:
        num_stage = len(self.ndepths)
        b, v, h, w, _ = imgs.shape
        scale0 = 2 ** (num_stage - 1)
        if h % (scale0 * 8) or w % (scale0 * 8):
            raise ValueError(
                f"image size ({h}x{w}) must be divisible by {scale0 * 8}: the "
                "coarsest stage runs at 1/4 resolution through a 3-level "
                "stride-2 cost U-Net"
            )
        for nd in self.ndepths:
            if nd % 8:
                raise ValueError(
                    f"each ndepths entry must be divisible by 8 (got {self.ndepths}): "
                    "the cost U-Net halves the plane axis three times"
                )
        depth_values = depth_values.astype(jnp.float32)
        # NOTE: divided by D0, not D0-1 (reference networks/mvsnet.py:196).
        depth_interval = (depth_values[0, -1] - depth_values[0, 0]) / depth_values.shape[1]

        fold_kw = {} if self.fold_level0 is None else {"fold_level0": self.fold_level0}
        cr_dtype = self.dtype if self.costreg_dtype is None else self.costreg_dtype

        # --- feature extraction: one batched call over B*V images ---
        # (training keeps the single call: BN batch stats stay view- and
        # batch-global).  At EVAL with B > 1 the call is chunked per batch
        # element: XLA lays the full-res narrow-C conv temps out with
        # N on sublanes / C on lanes (6.4-12.8x pad expansion — the B=2
        # r4 chip OOM, 17.4 G > 15.75 G HBM), so temp size must be bounded
        # by the per-element view count, not B*V.  Running stats make the
        # chunked eval outputs identical to the batched ones.
        f_dtype = self.dtype if self.feature_dtype is None else self.feature_dtype
        # remat: checkpoint the feature net too.  Its full-res narrow-C
        # conv activations are the largest single block of backward
        # residuals at the train recipe — XLA lays the b*v=10-batch C=8
        # convs out N-minor (12.8x lane padding), so ~10 saved full-res
        # activations cost O(10 GB) of padded HBM (the r4 train-step
        # "components sum 0.6 s, composed runs 7 s" spill/compression
        # cliff).  Checkpointing saves only the images and recomputes the
        # FPN inside its backward region where temps are transient.
        fnet_cls = (nn.remat(FeatureNet, static_argnums=(2,))
                    if self.remat else FeatureNet)
        fnet = fnet_cls(self.base_channels, dtype=f_dtype, name="feature",
                        **fold_kw)
        imgs_flat = imgs.reshape(b * v, h, w, imgs.shape[-1])
        bv = b * v
        # eval chunk cap: ~the DTU 5-view working set.  Running stats make
        # any flat chunking exact, so the cap also bounds the T&T regime
        # (11 views at <=2048x1080, tank_test preset) that a single call
        # would OOM exactly like the r4 B=2 case.
        if train or bv <= 6:
            feats = fnet(imgs_flat, train)
        else:
            n_chunks = (bv + 5) // 6
            cs = (bv + n_chunks - 1) // n_chunks  # near-equal chunks <= 6
            chunks = [fnet(imgs_flat[i:i + cs], train)
                      for i in range(0, bv, cs)]
            feats = {k: jnp.concatenate([c[k] for c in chunks], axis=0)
                     for k in chunks[0]}
        feats = {k: f.reshape(b, v, *f.shape[1:]).astype(self.dtype)
                 for k, f in feats.items()}

        outputs: dict[str, Any] = {}
        last_depth = None
        for s in range(num_stage):
            stage = f"stage{s + 1}"
            scale = 2 ** (num_stage - s - 1)
            sh, sw = h // scale, w // scale
            proj2 = proj_matrices[stage]

            if s == 0:
                samples, interval = sampling.stage1_samples(
                    depth_values, self.ndepths[0], sh, sw, inverse=self.inverse_depth
                )
            else:
                samples, interval = sampling.cascade_samples(
                    jax.lax.stop_gradient(last_depth),
                    self.ndepths[s],
                    jnp.float32(self.depth_interval_ratio[s]) * depth_interval,
                    inverse=self.inverse_depth,
                )
                samples = sampling.upsample_depth_samples(samples, sh, sw)

            vp_size = (
                self.mesh.shape[mesh_lib.AXIS_VIEW]
                if self.mesh is not None
                and mesh_lib.AXIS_VIEW in getattr(self.mesh, "axis_names", ())
                else 0
            )

            def cost_pass(key_suffix: str, dv: jnp.ndarray) -> jnp.ndarray:
                views = [feats[stage + key_suffix][:, i] for i in range(v)]
                if self.agg_mode == "adaptive":
                    weight_net = AggWeightNetVolume(
                        dtype=self.dtype, name=f"agg_weight_{s}{key_suffix}"
                    )
                    cost = warp_ops.aggregate_cost_volume_adaptive(
                        views, proj2, dv,
                        lambda sim: weight_net(sim.astype(self.dtype), train),
                    )
                elif vp_size > 1 and (v - 1) % vp_size == 0:
                    # source views sharded over the vp mesh axis; one psum
                    # yields the replicated cost volume (SURVEY §2.8)
                    cost = warp_ops.aggregate_cost_volume_view_sharded(
                        views, proj2, dv, self.mesh,
                        use_pallas=self.use_pallas_warp,
                    )
                elif (self.use_epipolar_warp and not train
                      and s in (self.epipolar_refine_stages if key_suffix
                                else self.epipolar_main_stages)):
                    from dmvsnet_tpu.ops.pallas.epipolar_sweep import (
                        aggregate_cost_volume_epipolar,
                    )

                    cost = aggregate_cost_volume_epipolar(views, proj2, dv)
                elif self.use_pallas_warp:
                    from dmvsnet_tpu.ops.pallas import aggregate_cost_volume_pallas

                    cost = aggregate_cost_volume_pallas(views, proj2, dv)
                else:
                    cost = warp_ops.aggregate_cost_volume(views, proj2, dv)
                return mesh_lib.constrain(
                    cost, self.mesh, mesh_lib.spatial_spec(cost.ndim, h_axis=2)
                )

            if self.remat and train and self.agg_mode != "adaptive":
                # checkpoint the warp too: the custom-VJP path otherwise
                # saves the tiled reference / packed source / cost volume
                # as residuals (~2 GB at the train recipe).  The step is
                # HBM-capacity-bound on v5e — components sum to ~0.6 s but
                # the composed step ran at 7.6 s from spill/compression
                # thrash (STAGETIME_grad r4) — so trading a warp recompute
                # for residual headroom is the right side of the roofline.
                # (adaptive mode owns a flax submodule -> needs nn.remat;
                # excluded until someone ships that mode for training)
                _raw_cost_pass = cost_pass

                def cost_pass(key_suffix, dv, _raw=_raw_cost_pass):
                    return jax.checkpoint(lambda d: _raw(key_suffix, d))(dv)

            frac = self.run_stages - s if self.run_stages else 99.0
            if frac <= 0.3:
                outputs["partial"] = samples
                break

            # pass 1: full-plane sweep
            cost = cost_pass("", samples)
            if frac <= 0.5:
                outputs["partial"] = cost
                break
            reg_cls = (nn.remat(CostRegNet, static_argnums=(2,))
                       if self.remat else CostRegNet)
            cost_reg = reg_cls(
                self.cr_base_channels[s], dtype=cr_dtype, name=f"cost_reg_{s}",
                **fold_kw,
            )(cost.astype(cr_dtype), train)
            if frac <= 0.7:
                outputs["partial"] = cost_reg
                break
            stage_out = depth_net.forward(cost_reg, samples, interval)

            # pass 2: 4-plane checkerboard refine on the "_c" features
            dv_c = stage_out["depth_values_c"]
            cost_c = cost_pass("_c", dv_c)
            if frac <= 0.85:
                outputs["partial"] = cost_c
                break
            regr_cls = (
                nn.remat(CostRegNetRefine, static_argnums=(2,))
                if self.remat else CostRegNetRefine
            )
            cost_reg_c = regr_cls(
                self.cr_base_channels[s], dtype=cr_dtype,
                name=f"cost_reg_refine_{s}", **fold_kw,
            )(cost_c.astype(cr_dtype), train)
            if frac <= 0.95:
                outputs["partial"] = cost_reg_c
                break
            refine_out = depth_net.refine(cost_reg_c, dv_c, interval)

            stage_out = {**refine_out, **stage_out}
            last_depth = stage_out["depth"]
            outputs[stage] = stage_out
            outputs.update(stage_out)
            if self.run_stages and s + 1 >= self.run_stages:
                break

        return outputs
