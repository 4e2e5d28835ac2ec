"""Depth-map quality metrics (reference tools.py:160-201).

Per-image masked reductions, NaN-guarded exactly like the reference
(an image with an empty mask contributes 0, not NaN), averaged over the
batch.  All functions are jit-friendly (static shapes, no boolean
indexing).
"""

from __future__ import annotations

import jax.numpy as jnp


def _per_image_masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked pixels per image; 0 where the mask is empty."""
    count = jnp.sum(mask, axis=(1, 2))
    total = jnp.sum(values * mask, axis=(1, 2))
    per_image = jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
    return jnp.mean(per_image)


def abs_depth_error(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean absolute depth error over masked pixels, per-image averaged
    (reference AbsDepthError_metrics, tools.py:176-185)."""
    mask = mask.astype(jnp.float32)
    return _per_image_masked_mean(jnp.abs(depth_est - depth_gt), mask)


def threshold_error(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray, thres: float
) -> jnp.ndarray:
    """Fraction of masked pixels with |error| > thres, per-image averaged
    (reference Thres_metrics, tools.py:188-201)."""
    mask = mask.astype(jnp.float32)
    err = (jnp.abs(depth_est - depth_gt) > thres).astype(jnp.float32)
    return _per_image_masked_mean(err, mask)


def standard_metrics(depth_est, depth_gt, mask) -> dict[str, jnp.ndarray]:
    """The Th2/Th4/Th8 + abs-err bundle logged by the reference trainer
    (reference model.py:143-146)."""
    return {
        "abs_depth_error": abs_depth_error(depth_est, depth_gt, mask),
        "thres2mm_error": threshold_error(depth_est, depth_gt, mask, 2.0),
        "thres4mm_error": threshold_error(depth_est, depth_gt, mask, 4.0),
        "thres8mm_error": threshold_error(depth_est, depth_gt, mask, 8.0),
    }
