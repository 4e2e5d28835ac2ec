"""Fused plane-sweep warp + group correlation as a Pallas TPU kernel.

The hot loop of the network (reference networks/mvsnet.py:131-150) is a
bilinear gather — and TPUs hate gathers (Mosaic's dynamic indexing stops
at one 8x128 register tile; XLA's generic gather lowers to scalar-ish
row takes ~100x off roofline).  This kernel eliminates the gather.

Layout doctrine (hard-won): pixels live on the LANE axis everywhere.
Mosaic cannot shape-cast between lanes and sublanes, and any HBM array
whose trailing dimension is small gets padded to 128 lanes (a stray
(..., P, 1) coordinate buffer inflates 128x — tens of GB at full
resolution).  With pixels on lanes every buffer is naturally aligned:

  coords  (D, nh, 2*nw, P)   rows [2j, 2j+1] = (px, py) of tile (i, j)
  origin  (D, nh, nw, 2)     SMEM  [rb, c0] window origin per tile
  src_T   (H/G, G*C, Wp)     row-packed + transposed source features
  ref_T   (nh, nw, G*C, P)   reference tile, channels tiled G times
  out     (D, nh, 2*nw, P)   rows [2j, 2j+1] = the 2 correlation groups

Per (depth plane, BR x BL output tile), with P = BR*BL pixels:

1. (px, py) and the window origin are computed OUTSIDE by the same jnp
   geometry as the XLA reference path (exact parity; keeps cross-tile
   reductions out of Mosaic) and arrive pre-tiled;
2. DMA the source window: q full blocks of (G*C=128 sublanes x C_WIN
   lanes), where G = 128/C consecutive source rows are pre-packed into
   the sublane axis; c0 is 128-aligned so the lane slice is legal;
3. bilinear x-interpolation as a band matrix on the MXU:
       res_j = win_j (128, C_WIN) @ Rx (C_WIN, P),
   Rx[cc, p] = hat(px_p - (c0 + cc)) built from iota compares;
4. y-interpolation/row-selection as a sublane-masked hat-weighted sum:
   sublane s of res_j holds source row rb*G + j*G + s//C, channel s%C;
5. multiply by the reference tile and reduce each channel-group's
   sublanes to one (1, P) row.

Zero padding (grid_sample semantics, reference networks/module.py:247)
falls out of the hat weights: taps outside the image either fall outside
the window (no column carries weight) or land in zero-padded columns.

Constraints (wrapper-enforced): C divides 128; px span within a BL-lane
tile must fit C_WIN-130 (after 128-alignment of c0) and py span within a
BR-row tile must fit the q*G-row window — true for plane-sweep warps
between same-resolution views at |scale-1| < ~1 and moderate rotation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmvsnet_tpu.core import geometry

BR = 8        # output rows per tile
BL = 128      # output lanes (columns) per tile
C_WIN = 384   # source cols per window (>= 130 + 254 span coverage)
MIN_ROWS = 20  # min source rows per window (incl. margin for PD-groups)
PD = 4        # depth planes per kernel instance sharing one window DMA
# (adjacent plane-sweep hypotheses shift the projection by only a few
# pixels, so a group of PD planes shares a window with a small margin)

# MXU precision for the band matmul.  HIGHEST = exact fp32 (bf16-pass
# emulation) for bit-parity with the XLA path; DEFAULT = one bf16 pass,
# ~1e-2 absolute error on O(1) correlations — indistinguishable in
# depth-map quality and ~2-3x faster.  Module-level so callers can flip.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def _row_group(c: int) -> tuple[int, int]:
    """(G rows packed per 128-sublane slot, q packed blocks per window)."""
    if 128 % c:
        raise ValueError(f"channel count {c} must divide 128")
    g = 128 // c
    q = (MIN_ROWS + g - 1) // g + 1  # +1 block pays for rb alignment loss
    return g, q


def _make_kernel(c: int, pd: int):
    g, q = _row_group(c)
    p = BR * BL

    def kernel(orig_ref, coord_ref, src_hbm, ref_ref, out_ref, win_ref, sem):
        # coord/out blocks hold PD planes x a whole row of tiles (j is the
        # innermost grid axis, so blocks stay VMEM-resident while j
        # sweeps); each instance reads/writes its tile's sublane pair
        # dynamically, and PD planes share ONE window DMA (adjacent
        # hypotheses project only a few pixels apart).
        ix = pl.program_id(2)
        rb = orig_ref[0, 0, ix, 0]
        c0 = pl.multiple_of(orig_ref[0, 0, ix, 1], 128)  # aligned by wrapper

        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(rb, q), :, pl.ds(c0, C_WIN)], win_ref, sem
        )
        cp.start()
        cp.wait()

        cc = (c0 + jax.lax.broadcasted_iota(jnp.int32, (C_WIN, p), 0)).astype(
            jnp.float32
        )
        r0f = (rb * g).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (g * c, p), 0)
        l_of_sub = (sub // c).astype(jnp.float32)
        half = c // 2
        gmask0 = ((sub % c) < half).astype(jnp.float32)
        refv = ref_ref[0, 0].astype(jnp.float32)  # (G*C, P), channels tiled

        for pdi in range(pd):
            px = coord_ref[pdi, 0, pl.ds(2 * ix, 1), :]  # (1, P)
            py = coord_ref[pdi, 0, pl.ds(2 * ix + 1, 1), :]
            # Rx[cc, p] = hat(px_p - (c0 + cc)) — band matrix, window cols
            # on sublanes, pixels on lanes.
            rx = jnp.maximum(0.0, 1.0 - jnp.abs(px - cc))

            corr0 = jnp.zeros((1, p), jnp.float32)
            corr1 = jnp.zeros((1, p), jnp.float32)
            for j in range(q):
                res = jnp.dot(
                    win_ref[j], rx, preferred_element_type=jnp.float32,
                    precision=MATMUL_PRECISION,
                )  # (G*C, P): sublane s = row rb*G+j*G+s//C, channel s%C
                wyb = jnp.maximum(
                    0.0, 1.0 - jnp.abs(py - (r0f + j * g + l_of_sub))
                )
                z = res * refv * wyb
                corr0 = corr0 + jnp.sum(z * gmask0, axis=0, keepdims=True)
                corr1 = corr1 + jnp.sum(z * (1.0 - gmask0), axis=0, keepdims=True)
            out_ref[pdi, 0, pl.ds(2 * ix, 1), :] = corr0 / half
            out_ref[pdi, 0, pl.ds(2 * ix + 1, 1), :] = corr1 / half

    return kernel


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _tile_lanes(a: jnp.ndarray, nh: int, nw: int):
    """(..., nh*BR, nw*BL) -> (..., nh, nw, BR*BL) with pixels flattened
    row-major inside each tile."""
    lead = a.shape[:-2]
    a = a.reshape(*lead, nh, BR, nw, BL)
    a = a.transpose(*range(len(lead)), len(lead), len(lead) + 2,
                    len(lead) + 1, len(lead) + 3)
    return a.reshape(*lead, nh, nw, BR * BL)


def _corr_view_tiled(
    src_feat: jnp.ndarray,
    ref_t: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    interpret: bool,
) -> jnp.ndarray:
    """One view's correlation in the TILED output layout (D, nh, 2nw, P).

    ref_t is the pre-tiled reference (see plane_sweep_corr_view); callers
    aggregating several views share it and untile the SUM once.
    """
    h, w, c = src_feat.shape
    g, q = _row_group(c)
    dpl = depth_values.shape[0]
    wp = _round_up(w, max(BL, C_WIN))
    hp = _round_up(max(h, (q + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    p = BR * BL

    # group-major channel permutation: [0,2,4,...,1,3,5,...]
    perm = list(range(0, c, 2)) + list(range(1, c, 2))
    srcp = jnp.pad(src_feat[..., perm], ((0, hp - h), (0, wp - w), (0, 0)))

    # coordinates from the SAME geometry as the XLA path (exact parity).
    # Pad HIGH: the window origin is a per-tile MINIMUM and a low pad
    # value would drag windows away from partially-padded tiles' pixels.
    px, py = geometry.plane_sweep_coords(
        rel_proj[None], depth_values[None], h, w
    )
    px = jnp.clip(px[0], -2.0, float(wp) + 1.0)
    py = jnp.clip(py[0], -2.0, float(hp) + 1.0)
    px = jnp.pad(
        px, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=float(wp) + 1.0
    )
    py = jnp.pad(
        py, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=float(hp) + 1.0
    )
    px_t = _tile_lanes(px, nh, nw)  # (D, nh, nw, P)
    py_t = _tile_lanes(py, nh, nw)

    # group PD consecutive planes per kernel instance (shared window DMA)
    pd = PD if dpl % PD == 0 else (2 if dpl % 2 == 0 else 1)

    # per-GROUP window origin: the union over the group's planes
    # (c0 aligned down to 128 for legal DMA lane slices)
    c0 = jnp.clip(
        (jnp.floor(
            jnp.min(px_t.reshape(dpl // pd, pd, nh, nw, p), axis=(1, 4))
        ).astype(jnp.int32) - 1) // BL * BL,
        0, wp - C_WIN,
    )
    rb = jnp.clip(
        (jnp.floor(
            jnp.min(py_t.reshape(dpl // pd, pd, nh, nw, p), axis=(1, 4))
        ).astype(jnp.int32) - 1) // g,
        0, hp // g - q,
    )
    origin = jnp.stack([rb, c0], axis=-1)  # (D/PD, nh, nw, 2) int32

    # interleave px/py as rows [2j, 2j+1] so the coord block keeps its
    # last two dims equal to (2, P) — no sub-128 trailing dims anywhere
    coords = jnp.stack([px_t, py_t], axis=3)  # (D, nh, nw, 2, P)
    coords = coords.reshape(dpl, nh, 2 * nw, p)

    # row-packed + transposed source: (H/G, G*C, Wp)
    src_packed = srcp.reshape(hp // g, g, wp, c).transpose(0, 2, 1, 3).reshape(
        hp // g, wp, g * c
    )
    src_t = src_packed.transpose(0, 2, 1)

    grid = (dpl // pd, nh, nw)
    kernel = _make_kernel(c, pd)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, nw, 2), lambda d, i, j: (d, i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (pd, 1, 2 * nw, p), lambda d, i, j: (d, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed src stays in HBM
            pl.BlockSpec(
                (1, 1, g * c, p), lambda d, i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (pd, 1, 2 * nw, p), lambda d, i, j: (d, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((dpl, nh, 2 * nw, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q, g * c, C_WIN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(origin, coords, src_t, ref_t)
    return out


def _tile_ref(ref_feat: jnp.ndarray) -> jnp.ndarray:
    """Pre-tile the reference features for _corr_view_tiled:
    (H, W, C) -> (nh, nw, G*C, P), channels group-major and tiled G times."""
    h, w, c = ref_feat.shape
    g, q = _row_group(c)
    wp = _round_up(w, max(BL, C_WIN))
    hp = _round_up(max(h, (q + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    perm = list(range(0, c, 2)) + list(range(1, c, 2))
    refp = jnp.pad(ref_feat[..., perm], ((0, hp - h), (0, wp - w), (0, 0)))
    return jnp.tile(
        jnp.moveaxis(_tile_lanes(jnp.moveaxis(refp, -1, 0), nh, nw), 0, 2),
        (1, 1, g, 1),
    )


def _untile_out(out: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(D, nh, 2nw, P) tiled correlation -> (D, H, W, 2)."""
    dpl, nh, nw2, p = out.shape
    nw = nw2 // 2
    out = out.reshape(dpl, nh, nw, 2, BR, BL)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(dpl, nh * BR, nw * BL, 2)
    return out[:, :h, :w, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def plane_sweep_corr_view(
    src_feat: jnp.ndarray,
    ref_feat: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Correlation volume contribution of one source view.

    Args:
      src_feat, ref_feat: (H, W, C) single-image features, NATURAL channel
        order (k-major interleaved groups, like the torch reference).
      rel_proj: (4, 4) relative fused projection (src @ inv(ref)).
      depth_values: (D, H, W) per-pixel hypotheses.

    Returns:
      (D, H, W, 2) float32 group correlation, identical (up to fp
      rounding) to group_correlation(warp(src), ref).
    """
    h, w, _ = src_feat.shape
    ref_t = _tile_ref(ref_feat)
    out = _corr_view_tiled(src_feat, ref_t, rel_proj, depth_values, interpret)
    return _untile_out(out, h, w)


def aggregate_cost_volume_pallas(
    features: list[jnp.ndarray],
    proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.warp.aggregate_cost_volume on the Pallas path.

    features: per-view [(B, H, W, C)]; proj2: (B, V, 2, 4, 4);
    depth_values: (B, D, H, W) (per-pixel) or (B, D) (broadcast).
    """
    b = features[0].shape[0]
    h, w = features[0].shape[1:3]
    if depth_values.ndim == 2:
        depth_values = jnp.broadcast_to(
            depth_values[:, :, None, None], (b, depth_values.shape[1], h, w)
        )
    fused = geometry.fuse_projection(proj2)

    def one_batch(feats_b, fused_b, dv_b):
        # tile the reference ONCE, accumulate views in the tiled layout,
        # untile the sum once — 4 views share one set of transposes
        ref_t = _tile_ref(feats_b[0])
        total = None
        for v in range(1, len(features)):
            rel = geometry.relative_projection(fused_b[v], fused_b[0])
            corr = _corr_view_tiled(
                feats_b[v], ref_t, rel, dv_b, interpret=interpret
            )
            total = corr if total is None else total + corr
        return _untile_out(total, h, w)

    outs = []
    for bi in range(b):
        outs.append(
            one_batch([f[bi] for f in features], fused[bi], depth_values[bi])
        )
    return jnp.stack(outs)
