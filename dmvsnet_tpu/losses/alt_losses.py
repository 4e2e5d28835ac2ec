"""Alternate depth-supervision losses (classification / gfocal / unification).

Ports of the semantics at reference loss.py:161-270.  These modes are
argparse choices in the reference but dead in every shipped config
(SURVEY.md §2.1 note); they are provided for API completeness and follow
the reference faithfully — including its quirk of feeding the *softmaxed*
prob_volume into a with-logits BCE (reference loss.py:84,195).

Layouts: prob_volume (B, D, H, W, C=4 here vs the reference's 2-channel
volume — the per-channel loss is averaged identically), depth_values
(B, D, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, targets, pos_weight=None):
    """Numerically-stable BCE-with-logits (reference loss.py:161-187)."""
    max_val = jnp.clip(-logits, 0, None)
    log_term = max_val + jnp.log(jnp.exp(-max_val) + jnp.exp(-logits - max_val))
    if pos_weight is None:
        return logits - logits * targets + log_term
    log_weight = 1 + (pos_weight - 1) * targets
    return logits - logits * targets + log_weight * log_term


def _gt_index_volume(depth_values, depth_gt, interval, centered: bool):
    gt = depth_gt[:, None]
    if centered:
        return (
            ((depth_values - interval / 2) <= gt)
            & ((depth_values + interval / 2) > gt)
        ).astype(jnp.float32)
    return ((depth_values <= gt) & ((depth_values + interval) > gt)).astype(jnp.float32)


def classification_loss(prob_volume, depth_values, interval, depth_gt, mask, weight):
    """BCE with pos_weight=(D-1) over the hypothesis axis
    (reference classification_loss_1, loss.py:188-196)."""
    d = depth_values.shape[1]
    gt_vol = _gt_index_volume(depth_values, depth_gt, interval, centered=True)
    if prob_volume.ndim == 5:  # (B, D, H, W, C): average the channel axis
        gt_vol = gt_vol[..., None]
        mask_e = mask[:, None, :, :, None]
    else:
        mask_e = mask[:, None]
    ce = _bce_with_logits(prob_volume, gt_vol, pos_weight=float(d - 1)) * weight
    mask_e = jnp.broadcast_to(mask_e, ce.shape)
    total = jnp.sum(ce * mask_e)
    count = jnp.sum(mask_e)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def gfocal_loss(prob_volume, depth_values, interval, depth_gt, mask, weight,
                gamma, alpha):
    """Generalized focal loss (reference loss.py:212-229)."""
    gt_vol = _gt_index_volume(depth_values, depth_gt, interval, centered=False)
    if prob_volume.ndim == 5:
        gt_vol = gt_vol[..., None]
        mask_e = jnp.broadcast_to(mask[:, None, :, :, None], prob_volume.shape)
    else:
        mask_e = jnp.broadcast_to(mask[:, None], prob_volume.shape)
    pos_w = jnp.abs(gt_vol - prob_volume) ** gamma * (gt_vol > 0)
    neg_w = alpha * prob_volume ** gamma * (gt_vol <= 0)
    focal = pos_w + neg_w
    p = jnp.clip(prob_volume, 1e-4, 1.0 - 1e-7)
    bce = -(gt_vol * jnp.log(p) + (1 - gt_vol) * jnp.log1p(-p))
    loss = jnp.sum(bce * focal * mask_e) / jnp.maximum(jnp.sum(mask_e), 1)
    return loss * weight


def unified_focal_loss(prob_volume, depth_values, interval, depth_gt, mask, weight,
                       gamma, alpha):
    """Unity-target focal loss (reference loss.py:252-270)."""
    gt_vol = _gt_index_volume(depth_values, depth_gt, interval, centered=False)
    unity = jnp.where(
        gt_vol > 0, 1.0 - (depth_gt[:, None] - depth_values) / interval, 0.0
    )
    if prob_volume.ndim == 5:
        unity = unity[..., None]
        mask_e = jnp.broadcast_to(mask[:, None, :, :, None], prob_volume.shape)
    else:
        mask_e = jnp.broadcast_to(mask[:, None], prob_volume.shape)
    gt_unity = jnp.max(unity, axis=1, keepdims=True)
    gt_unity = jnp.where(gt_unity > 0, gt_unity, 1.0)

    def sig5(x):
        return 1.0 / (1.0 + jnp.power(5.0, -x))

    pos_w = (sig5(jnp.abs(gt_unity - prob_volume) / gt_unity) - 0.5) * 4 + 1
    neg_w = (sig5(prob_volume / gt_unity) - 0.5) * 2
    focal = pos_w ** gamma * (unity > 0) + alpha * neg_w ** gamma * (unity <= 0)
    p = jnp.clip(prob_volume, 1e-7, 1.0 - 1e-7)
    bce = -(unity * jnp.log(p) + (1 - unity) * jnp.log1p(-p))
    loss = jnp.sum(bce * focal * mask_e) / jnp.maximum(jnp.sum(mask_e), 1)
    return loss * weight


def entropy_loss(prob_volume, depth_gt, mask, depth_values):
    """Masked cross-entropy to the nearest-hypothesis one-hot
    (reference loss.py:273-306).  prob_volume: (B, D, H, W)."""
    idx = jnp.argmin(jnp.abs(depth_values - depth_gt[:, None]), axis=1)  # (B, H, W)
    d = prob_volume.shape[1]
    one_hot = jax.nn.one_hot(idx, d, axis=1)
    ce = -jnp.sum(one_hot * jnp.log(prob_volume + 1e-6), axis=1)
    valid = jnp.sum(mask, axis=(1, 2)) + 1e-6
    return jnp.mean(jnp.sum(ce * mask, axis=(1, 2)) / valid)


_FL_GAMMAS = (2.0, 1.0, 0.0)
_FL_ALPHAS = (0.75, 0.5, 0.25)


def alt_mvs_loss(outputs, depth_gt_ms, mask_ms, mode, dlossw):
    """Stage loop for the alternate modes (reference loss.py:82-100)."""
    total = jnp.float32(0.0)
    for key in [k for k in outputs if k.startswith("stage")]:
        stage = outputs[key]
        idx = int(key.replace("stage", "")) - 1
        sw = jnp.float32(dlossw[idx])
        gt = depth_gt_ms[key].astype(jnp.float32)
        mask = (mask_ms[key] > 0.5).astype(jnp.float32)
        prob = stage["prob_volume"]
        dv = stage["depth_values"]
        interval = stage["interval"]
        if mode == "classification":
            total += classification_loss(prob, dv, interval, gt, mask, sw)
        elif mode == "gfocal":
            total += gfocal_loss(
                prob, dv, interval, gt, mask, sw, _FL_GAMMAS[idx], _FL_ALPHAS[idx]
            )
        elif mode == "unification":
            total += unified_focal_loss(
                prob, dv, interval, gt, mask, sw, _FL_GAMMAS[idx], _FL_ALPHAS[idx]
            )
        else:
            raise NotImplementedError(
                f"mode must be regression/classification/gfocal/unification, got {mode}"
            )
    return total
