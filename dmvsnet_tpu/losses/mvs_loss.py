"""Dual-depth training loss (regression mode + alternates).

Re-creates reference loss.py:5-159 on channels-last layouts.  Per stage
and per pass (forward + refine), four term groups:

  (a) 2x smooth-L1 on the small pair + 2x on the huge pair vs GT;
  (b) "variance" losses pulling |d0-d1| (small) and |d2-d3| (huge)
      toward the larger of the two GT errors;
  (c) 4 Monte-Carlo sub-pixel losses on checkerboard min/max composites,
      sampled at half-pixel centers;
  (d) the same block on the refine outputs.

Divergence from the reference, by design: empty-mask reductions return 0
instead of NaN (torch's ``tensor[mask].mean()`` of an empty selection is
NaN, reference loss.py:158 — which would poison a jitted training step).

All losses are computed in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmvsnet_tpu.core.sampling import checkerboard


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (huber, beta=1) — torch F.smooth_l1_loss."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def masked_weighted_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    count = jnp.sum(mask)
    total = jnp.sum(values * mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def regression_loss(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray,
    weight: jnp.ndarray,
) -> jnp.ndarray:
    """(smooth_l1(est, gt) * weight) averaged over masked elements
    (reference loss.py:156-159)."""
    return masked_weighted_mean(smooth_l1(depth_est, depth_gt) * weight, mask)


def half_pixel_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a (B, H, W) map at all (i+0.5, j+0.5) centers.

    At exact half-pixel offsets, bilinear == the mean of the 2x2 block, so
    the reference's grid_sample (loss.py:117-128, mode="center") reduces
    to this 2x2 average pool producing (B, H-1, W-1).
    """
    return 0.25 * (x[:, :-1, :-1] + x[:, :-1, 1:] + x[:, 1:, :-1] + x[:, 1:, 1:])


def subpixel_pool(x: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a (B, H, W) map at (i+oy, j+ox), offsets in [0,1).

    The general form of the reference's grid_sample at per-cell offsets
    (loss.py:110-128): taps stay inside the image so zero padding never
    triggers; each output cell mixes its 2x2 neighborhood.
    """
    w00 = (1.0 - oy) * (1.0 - ox)
    w01 = (1.0 - oy) * ox
    w10 = oy * (1.0 - ox)
    w11 = oy * ox
    return (w00 * x[:, :-1, :-1] + w01 * x[:, :-1, 1:]
            + w10 * x[:, 1:, :-1] + w11 * x[:, 1:, 1:])


def monte_carlo_loss(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray,
    weight: jnp.ndarray, mode: str = "center", reflect: bool = False,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Sub-pixel composite loss (reference loss.py:106-155).

    mode="center" samples GT/est/weight/mask at half-pixel centers (the
    only mode shipped configs use); mode="random" draws per-cell offsets
    U[0,1) from ``rng`` (reference loss.py:113-114).  Keeps only cells
    whose sampled mask reaches 1 (all four neighbors valid).

    reflect=True reproduces the unused reference branch (loss.py:139-151):
    cells whose 2x2 sign pattern of (est - gt) is uniform get weight 2
    (no gradient through the weights), and the loss is the plain masked
    smooth-L1 of the reweighted samples.
    """
    if mode == "center":
        pool = half_pixel_pool
    elif mode == "random":
        if rng is None:
            raise ValueError('monte_carlo_loss(mode="random") needs an rng key')
        kx, ky = jax.random.split(rng)
        shape = (depth_gt.shape[0], depth_gt.shape[1] - 1, depth_gt.shape[2] - 1)
        ox = jax.random.uniform(kx, shape, jnp.float32)
        oy = jax.random.uniform(ky, shape, jnp.float32)
        pool = lambda x: subpixel_pool(x, ox, oy)  # noqa: E731
    else:
        raise ValueError(f"unknown Monte-Carlo sampling mode {mode!r}")
    s_gt = pool(depth_gt)
    s_est = pool(depth_est)
    # center-mode pooling of a 0/1 mask is exact (0.25 * four ones == 1.0);
    # random offsets round, so test against 1 with an fp margin (the
    # reference's literal >= 1.0 on grid_sample output, loss.py:130, is
    # itself fp-dependent for such cells)
    thresh = 1.0 if mode == "center" else 1.0 - 1e-5
    s_mask = pool(mask.astype(jnp.float32)) >= thresh
    if reflect:
        err = jax.lax.stop_gradient(depth_est - depth_gt)
        up = half_pixel_pool((err > 0).astype(jnp.float32)) == 1.0
        dn = half_pixel_pool((err < 0).astype(jnp.float32)) == 1.0
        rw = jnp.where(up | dn, 2.0, 1.0)
        return masked_weighted_mean(smooth_l1(rw * s_est, rw * s_gt), s_mask)
    s_w = pool(weight)
    return regression_loss(s_est, s_gt, s_mask, s_w)


def _pass_loss(
    depth4: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray,
    stage_weight: jnp.ndarray,
) -> jnp.ndarray:
    """The 8-term block shared by forward and refine passes
    (reference loss.py:23-49 and its refine copy at :52-80).

    depth4: (B, H, W, 4) — [small0, small1, huge0, huge1].
    depth_gt, mask: (B, H, W).
    """
    w_map = jnp.full_like(depth_gt, stage_weight)
    gt4 = depth_gt[..., None]
    mask4 = mask[..., None]

    small, huge = depth4[..., :2], depth4[..., 2:]
    loss_depth = 2.0 * regression_loss(
        small, jnp.broadcast_to(gt4, small.shape),
        jnp.broadcast_to(mask4, small.shape), stage_weight,
    ) + 2.0 * regression_loss(
        huge, jnp.broadcast_to(gt4, huge.shape),
        jnp.broadcast_to(mask4, huge.shape), stage_weight,
    )

    def var_loss(a, b):
        ea = jnp.abs(a - depth_gt)
        eb = jnp.abs(b - depth_gt)
        var_gt = jnp.maximum(ea, eb)
        return regression_loss(jnp.abs(a - b), var_gt, mask, w_map)

    loss_var = var_loss(depth4[..., 0], depth4[..., 1]) + var_loss(
        depth4[..., 2], depth4[..., 3]
    )

    cb = checkerboard(*depth_gt.shape[-2:])[None]
    s_min, s_max = jnp.min(small, -1), jnp.max(small, -1)
    h_min, h_max = jnp.min(huge, -1), jnp.max(huge, -1)
    loss_mc = (
        monte_carlo_loss(jnp.where(cb, s_min, s_max), depth_gt, mask, w_map)
        + monte_carlo_loss(jnp.where(~cb, s_min, s_max), depth_gt, mask, w_map)
        + monte_carlo_loss(jnp.where(cb, h_min, h_max), depth_gt, mask, w_map)
        + monte_carlo_loss(jnp.where(~cb, h_min, h_max), depth_gt, mask, w_map)
    )
    return loss_depth + loss_var + loss_mc


def mvs_loss(
    outputs: dict, depth_gt_ms: dict, mask_ms: dict, mode: str = "regression",
    dlossw: tuple = (0.5, 1.0, 2.0),
) -> jnp.ndarray:
    """Total loss over stages (reference loss.py:5-104).

    Args:
      outputs: model output dict (per-stage dicts under "stage{i}").
      depth_gt_ms / mask_ms: {"stage{i}": (B, H_i, W_i)} pyramids.
      mode: "regression" (dual-depth path) | "classification" | "gfocal"
        | "unification" — alternates live in `losses.alt_losses`.
    """
    if mode != "regression":
        from dmvsnet_tpu.losses import alt_losses

        return alt_losses.alt_mvs_loss(outputs, depth_gt_ms, mask_ms, mode, dlossw)

    total = jnp.float32(0.0)
    stage_keys = [k for k in outputs if k.startswith("stage")]
    for key in stage_keys:
        stage = outputs[key]
        idx = int(key.replace("stage", "")) - 1
        sw = jnp.float32(dlossw[idx])
        gt = depth_gt_ms[key].astype(jnp.float32)
        mask = (mask_ms[key] > 0.5).astype(jnp.float32)
        total = total + _pass_loss(stage["depth_sub_plus"], gt, mask, sw)
        total = total + _pass_loss(stage["depth_sub_plus_refine"], gt, mask, sw)
    return total
