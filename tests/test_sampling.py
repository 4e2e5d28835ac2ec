"""Golden tests for the depth-hypothesis samplers.

Oracles are independent numpy transcriptions of the sampler semantics
documented in SURVEY.md §2.2 (reference networks/module.py:476-649),
plus torch.nn.functional.interpolate for the bilinear upsample.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dmvsnet_tpu.core import sampling


def np_checkerboard(h, w):
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (y % 2) == (x % 2)


def test_checkerboard_small():
    cb = np.asarray(sampling.checkerboard(3, 4))
    expect = np.array(
        [
            [1, 0, 1, 0],
            [0, 1, 0, 1],
            [1, 0, 1, 0],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(cb, expect)


def test_stage1_samples_uniform():
    dv = np.linspace(425.0, 935.0, 192, dtype=np.float32)[None].repeat(2, 0)
    d, h, w = 8, 4, 6
    samples, si = sampling.stage1_samples(jnp.asarray(dv), d, h, w, inverse=False)
    samples = np.asarray(samples)
    interval = (935.0 - 425.0) / (d - 1)
    base = 425.0 + np.arange(d) * interval
    cb = np_checkerboard(h, w)
    expect = np.where(cb[None, None], base[None, :, None, None] - interval,
                      base[None, :, None, None] + interval)
    np.testing.assert_allclose(samples[0], expect[0], rtol=1e-5)
    np.testing.assert_allclose(float(si), interval, rtol=1e-6)


def test_stage1_samples_inverse():
    dv = np.linspace(425.0, 935.0, 192, dtype=np.float32)[None]
    d, h, w = 8, 2, 2
    samples, si = sampling.stage1_samples(jnp.asarray(dv), d, h, w, inverse=True)
    samples = np.asarray(samples)
    interval = (935.0 - 425.0) / (d - 1)
    # minus fan at parity-equal pixel (0,0); plus fan at (0,1)
    for shift, (py, px) in [(-interval, (0, 0)), (interval, (0, 1))]:
        lo, hi = 425.0 + shift, 935.0 + shift
        inv = np.linspace(1.0 / lo, 1.0 / hi, d)
        np.testing.assert_allclose(samples[0, :, py, px], 1.0 / inv, rtol=1e-5)
    np.testing.assert_allclose(float(si), interval, rtol=1e-6)


def test_cascade_samples_windows():
    rng = np.random.default_rng(1)
    last = rng.uniform(500, 700, size=(1, 4, 4)).astype(np.float32)
    d, ivl = 8, 2.5
    samples, si = sampling.cascade_samples(jnp.asarray(last), d, jnp.float32(ivl))
    samples = np.asarray(samples)
    np.testing.assert_allclose(float(si), d * ivl / (d - 1), rtol=1e-6)
    cb = np_checkerboard(4, 4)
    for py in range(4):
        for px in range(4):
            c = last[0, py, px]
            if cb[py, px]:  # minus window
                lo, hi = c - (d + 2) / 2 * ivl, c + (d - 2) / 2 * ivl
            else:
                lo, hi = c - (d - 2) / 2 * ivl, c + (d + 2) / 2 * ivl
            expect = lo + np.arange(d) * (hi - lo) / (d - 1)
            np.testing.assert_allclose(samples[0, :, py, px], expect, rtol=1e-5)


def test_cascade_samples_inverse_windows():
    last = np.full((1, 2, 2), 600.0, np.float32)
    d, ivl = 8, 2.0
    samples, _ = sampling.cascade_samples(
        jnp.asarray(last), d, jnp.float32(ivl), inverse=True
    )
    samples = np.asarray(samples)
    # (0,0): minus window in inverse space
    lo, hi = 600.0 - (d + 2) / 2 * ivl, 600.0 + (d - 2) / 2 * ivl
    inv = 1.0 / lo + np.arange(d) * (1.0 / hi - 1.0 / lo) / (d - 1)
    np.testing.assert_allclose(samples[0, :, 0, 0], 1.0 / inv, rtol=1e-5)
    # (0,1): plus window
    lo, hi = 600.0 - (d - 2) / 2 * ivl, 600.0 + (d + 2) / 2 * ivl
    inv = 1.0 / lo + np.arange(d) * (1.0 / hi - 1.0 / lo) / (d - 1)
    np.testing.assert_allclose(samples[0, :, 0, 1], 1.0 / inv, rtol=1e-5)


def test_upsample_matches_torch_bilinear():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 5, 7)).astype(np.float32)
    ours = np.asarray(sampling.upsample_depth_samples(jnp.asarray(x), 10, 14))
    theirs = F.interpolate(
        torch.from_numpy(x), (10, 14), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
