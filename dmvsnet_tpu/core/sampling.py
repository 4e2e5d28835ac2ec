"""Depth-hypothesis samplers with checkerboard offsets, pure jnp.

Re-creates the semantics of the reference sampler family
(reference networks/module.py:476-649) as vectorized closed forms:

* stage-1: a uniform (or inverse-depth uniform) fan over the global
  range, then every pixel is shifted by ±stage_interval on a 2x2
  checkerboard;
* cascade stages: per-pixel asymmetric windows around the previous
  depth, the "minus" window (-(D+2)/2 .. +(D-2)/2 intervals) on one
  checkerboard phase and its mirror on the other, with inverse-depth
  twins.

The reference rebuilds its coordinate meshgrids on every forward call;
here the checkerboard is a static iota that XLA constant-folds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def checkerboard(height: int, width: int) -> jnp.ndarray:
    """(H, W) bool mask, True where row-parity == col-parity.

    Matches the reference's ``(y%2==0 & x%2==0) | (y%2==1 & x%2==1)``
    construction (reference networks/module.py:577, loss.py:39).
    """
    y = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return (y % 2) == (x % 2)


def _fan(start: jnp.ndarray, step: jnp.ndarray, ndepth: int) -> jnp.ndarray:
    """start[..., None] + arange(D) * step[..., None] with D in axis 1."""
    ar = jnp.arange(ndepth, dtype=jnp.float32)
    # start/step: (B,) or (B, H, W) -> result (B, D) or (B, D, H, W)
    if start.ndim == 1:
        return start[:, None] + ar[None, :] * step[:, None]
    return start[:, None] + ar[None, :, None, None] * step[:, None]


def stage1_samples(
    depth_values: jnp.ndarray, ndepth: int, height: int, width: int,
    inverse: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First-stage hypotheses from the global (B, D0) depth range.

    Non-inverse (reference networks/module.py:560-580): uniform fan from
    depth_values[:,0] to depth_values[:,-1], broadcast over (H, W), then
    checkerboard-shifted by -stage_interval (parity-equal pixels) /
    +stage_interval (others).

    Inverse (reference networks/module.py:597-634): two fans uniform in
    1/d between the range endpoints shifted by -/+ stage_interval; the
    checkerboard picks the minus fan on parity-equal pixels.

    Returns:
      samples: (B, ndepth, H, W) float32.
      stage_interval: scalar — (max-min)/(ndepth-1) of batch element 0,
        matching the reference's ``new_interval[0]``.
    """
    depth_values = depth_values.astype(jnp.float32)
    dmin = depth_values[:, 0]
    dmax = depth_values[:, -1]
    interval = (dmax - dmin) / (ndepth - 1)  # (B,)
    stage_interval = interval[0]
    cb = checkerboard(height, width)[None, None]

    if not inverse:
        flat = _fan(dmin, interval, ndepth)  # (B, D)
        samples = jnp.broadcast_to(
            flat[:, :, None, None], (*flat.shape, height, width)
        )
        samples = jnp.where(cb, samples - stage_interval, samples + stage_interval)
        return samples, stage_interval

    def inv_fan(shift):
        lo = dmin + shift
        hi = dmax + shift
        inv_step = (1.0 / hi - 1.0 / lo) / (ndepth - 1)
        return 1.0 / _fan(1.0 / lo, inv_step, ndepth)  # (B, D)

    fan_n = inv_fan(-stage_interval)
    fan_p = inv_fan(stage_interval)
    shape = (fan_n.shape[0], ndepth, height, width)
    fan_n = jnp.broadcast_to(fan_n[:, :, None, None], shape)
    fan_p = jnp.broadcast_to(fan_p[:, :, None, None], shape)
    return jnp.where(cb, fan_n, fan_p), stage_interval


def cascade_samples(
    last_depth: jnp.ndarray, ndepth: int, interval_px: jnp.ndarray,
    inverse: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel hypotheses around the previous stage's depth map.

    The asymmetric windows (reference networks/module.py:476-507 and the
    inverse twins at :525-554) are:
      minus: [d - (D+2)/2 * ivl,  d + (D-2)/2 * ivl]
      plus : [d - (D-2)/2 * ivl,  d + (D+2)/2 * ivl]
    sampled uniformly in depth (or in 1/d for ``inverse``) with D points;
    the checkerboard takes "minus" where row-parity == col-parity
    (reference networks/module.py:590-594, :644-648).

    Args:
      last_depth: (B, H, W) previous-stage depth (already detached by the
        caller).
      interval_px: scalar — stage interval_ratio * global depth interval.

    Returns:
      samples: (B, ndepth, H, W); stage_interval scalar
        ``ndepth * interval_px / (ndepth - 1)``.
    """
    last_depth = last_depth.astype(jnp.float32)
    b, h, w = last_depth.shape
    cb = checkerboard(h, w)[None, None]

    def window(lo_k: float, hi_k: float) -> jnp.ndarray:
        lo = last_depth - lo_k * interval_px
        hi = last_depth + hi_k * interval_px
        if inverse:
            step = (1.0 / hi - 1.0 / lo) / (ndepth - 1)
            return 1.0 / _fan(1.0 / lo, step, ndepth)
        step = (hi - lo) / (ndepth - 1)
        return _fan(lo, step, ndepth)

    fan_n = window((ndepth + 2) / 2, (ndepth - 2) / 2)
    fan_p = window((ndepth - 2) / 2, (ndepth + 2) / 2)
    samples = jnp.where(cb, fan_n, fan_p)
    stage_interval = jnp.float32(ndepth * interval_px / (ndepth - 1))
    return samples, stage_interval


def upsample_depth_samples(samples: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear-resize (B, D, H, W) samples to (B, D, height, width).

    Matches ``F.interpolate(mode='bilinear', align_corners=False)``
    (reference networks/mvsnet.py:233, Align_Corners_Range=False) —
    half-pixel-center sampling, which is `jax.image.resize`'s 'linear'.
    """
    b, d = samples.shape[:2]
    return jax.image.resize(samples, (b, d, height, width), method="linear")
