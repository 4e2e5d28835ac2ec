"""Dual-depth regression head ("saddle-shaped depth cells"), functional.

Pure functions of the regularized cost volume — no parameters — mirroring
reference networks/mvsnet.py:11-100:

* ``forward``: softmax + soft-argmax per cost channel gives 4 depths per
  pixel (2 "small"-cell + 2 "huge"-cell); linear extrapolation stacks and
  a mod-4 x mod-2 checkerboard pick 4 new hypothesis planes per pixel for
  the refine pass.
* ``refine``: sharpened softmax (alpha=5), then a 2x2 checkerboard
  selects the final oscillating depth from {small_min, small_max,
  huge_max, huge_min} — this up/down selection is the saddle-cell output.

Layouts: cost_reg (B, D, H, W, 4); depth_values (B, D, H, W); returned
depth maps (B, H, W); depth_values_c (B, 4, H, W) ready for the warp.
All in float32 — sub-interval soft-argmax precision matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _parity_masks(height: int, width: int):
    y = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return y, x


def soft_argmax_depth(prob: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """sum_D(prob * depth) per channel (reference networks/module.py:454-460).

    prob: (B, D, H, W, C); depth_values: (B, D, H, W) -> (B, H, W, C).
    """
    return jnp.sum(prob * depth_values[..., None], axis=1)


def winner_take_all(prob_volume: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Argmax depth pick (reference networks/module.py:463-471).

    prob_volume, depth_values: (B, D, H, W) -> (B, H, W).
    """
    idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    return jnp.take_along_axis(depth_values, idx, axis=1)[:, 0]


def _confidence(depth4: jnp.ndarray, interval: jnp.ndarray) -> jnp.ndarray:
    """2*(sigmoid(interval/std)-0.5) with biased std over the 4 depths
    (reference networks/mvsnet.py:59-62)."""
    std = jnp.sqrt(jnp.var(depth4, axis=-1)) + 1e-5
    conf = jax.nn.sigmoid(interval / std)
    return jax.lax.stop_gradient(2.0 * (conf - 0.5))


def forward(
    cost_reg: jnp.ndarray, depth_values: jnp.ndarray, interval: jnp.ndarray
) -> dict[str, jnp.ndarray]:
    """First-pass head (reference networks/mvsnet.py:15-66).

    Returns keys matching the reference output dict: prob_volume,
    depth_sub_plus (B, H, W, 4), depth_values_c (B, 4, H, W),
    photometric_confidence, depth_values, interval.
    """
    cost_reg = cost_reg.astype(jnp.float32)
    prob = jax.nn.softmax(cost_reg, axis=1)
    depth4 = soft_argmax_depth(prob, depth_values)  # (B, H, W, 4)

    small, huge = depth4[..., :2], depth4[..., 2:]
    s_min, s_max = jnp.min(small, -1), jnp.max(small, -1)
    h_min, h_max = jnp.min(huge, -1), jnp.max(huge, -1)
    # doubled-interval variants (reference networks/mvsnet.py:27-28)
    s_min_d, s_max_d = 2 * s_min - s_max, 2 * s_max - s_min
    h_min_d, h_max_d = 2 * h_min - h_max, 2 * h_max - h_min

    def stack6(mn, mx):
        # {3mn-2mx, 2mn-mx, mn, mx, 2mx-mn, 3mx-2mn} (networks/mvsnet.py:42-45)
        return jnp.stack(
            [3 * mn - 2 * mx, 2 * mn - mx, mn, mx, 2 * mx - mn, 3 * mx - 2 * mn],
            axis=-1,
        )

    small_stack = stack6(s_min, s_max)
    small_stack_d = stack6(s_min_d, s_max_d)
    huge_stack = stack6(h_min, h_max)
    huge_stack_d = stack6(h_min_d, h_max_d)

    h_, w_ = depth4.shape[1:3]
    y, x = _parity_masks(h_, w_)
    y4, x2 = (y % 4)[None, :, :, None], (x % 2)[None, :, :, None]

    # mod-4 row x mod-2 col checkerboard -> 4 new planes per pixel
    # (reference networks/mvsnet.py:33-56): rows 0/1 use the plain stacks,
    # rows 2/3 the doubled-interval stacks; even cols slice [:-2] for
    # small / [2:] for huge, odd cols the mirror.
    dv_c = jnp.zeros_like(depth4)
    dv_c = jnp.where((y4 == 0) & (x2 == 0), small_stack[..., :4], dv_c)
    dv_c = jnp.where((y4 == 0) & (x2 == 1), small_stack[..., 2:], dv_c)
    dv_c = jnp.where((y4 == 1) & (x2 == 0), huge_stack[..., 2:], dv_c)
    dv_c = jnp.where((y4 == 1) & (x2 == 1), huge_stack[..., :4], dv_c)
    dv_c = jnp.where((y4 == 2) & (x2 == 0), small_stack_d[..., :4], dv_c)
    dv_c = jnp.where((y4 == 2) & (x2 == 1), small_stack_d[..., 2:], dv_c)
    dv_c = jnp.where((y4 == 3) & (x2 == 0), huge_stack_d[..., 2:], dv_c)
    dv_c = jnp.where((y4 == 3) & (x2 == 1), huge_stack_d[..., :4], dv_c)
    depth_values_c = jnp.moveaxis(dv_c, -1, 1)  # (B, 4, H, W)

    return {
        "prob_volume": prob,
        "depth_sub_plus": depth4,
        "depth_values_c": depth_values_c,
        "photometric_confidence": _confidence(depth4, interval),
        "depth_values": depth_values,
        "interval": interval,
    }


def refine(
    cost_reg: jnp.ndarray,
    depth_values: jnp.ndarray,
    interval: jnp.ndarray,
    alpha: float = 5.0,
) -> dict[str, jnp.ndarray]:
    """Refine-pass head (reference networks/mvsnet.py:67-100).

    depth_values here are the 4 checkerboard planes (B, 4, H, W).
    """
    cost_reg = cost_reg.astype(jnp.float32)
    prob = jax.nn.softmax(cost_reg * alpha, axis=1)
    depth4 = soft_argmax_depth(prob, depth_values)  # (B, H, W, 4)

    small, huge = depth4[..., :2], depth4[..., 2:]
    s_min, s_max = jnp.min(small, -1), jnp.max(small, -1)
    h_min, h_max = jnp.min(huge, -1), jnp.max(huge, -1)

    h_, w_ = depth4.shape[1:3]
    y, x = _parity_masks(h_, w_)
    y2, x2 = (y % 2)[None], (x % 2)[None]
    depth = jnp.zeros_like(s_min)
    depth = jnp.where((y2 == 0) & (x2 == 0), s_min, depth)
    depth = jnp.where((y2 == 0) & (x2 == 1), s_max, depth)
    depth = jnp.where((y2 == 1) & (x2 == 0), h_max, depth)
    depth = jnp.where((y2 == 1) & (x2 == 1), h_min, depth)

    return {
        "depth": depth,
        "photometric_confidence_refine": _confidence(depth4, interval),
        "depth_sub_plus_refine": depth4,
    }
