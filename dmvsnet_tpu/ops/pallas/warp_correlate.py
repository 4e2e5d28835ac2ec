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
C_WIN = 384   # max source cols per window (>= 130 + 254 span coverage)
C_WIN_FAST = 256  # narrow-window tier: band-matmul FLOPs scale with the
# window width, so geometries whose per-tile span fits 256 (all near-view
# plane sweeps; checked per call by _span_ok) run ~1.5x faster.  Window
# widths must stay multiples of 128 so c0 clip bounds stay lane-aligned.
MIN_ROWS = 16  # min source rows per window (incl. margin for PD-groups).
# Effective coverage after worst-case rb alignment loss is ~17 rows at
# every channel width: 8-row tiles at scale<=~1 + rotation tilt + the
# PD-group plane drift + 2 taps.  Safe to tune down: _span_ok routes any
# geometry that doesn't fit to the exact XLA fallback path.
MIN_ROWS_FAST = 12  # narrow-rows tier: cuts one whole (128, cwin)@(cwin, P)
# matmul per plane at c=32 (q 5 -> 4); DTU-eval geometries fit it at every
# stage (tools span analysis r3), and _span_ok tiering falls back to the
# 16-row kernel (then wide, then XLA) when they don't.  The PACKED source
# layout always uses the MIN_ROWS q so every tier shares one packing.
PD = 4        # depth planes per kernel instance sharing one window DMA
# (adjacent plane-sweep hypotheses shift the projection by only a few
# pixels, so a group of PD planes shares a window with a small margin)

# MXU precision for the band matmul.  HIGHEST = exact fp32 (bf16-pass
# emulation) for bit-parity with the XLA path; DEFAULT = one bf16 pass,
# ~1e-2 absolute error on O(1) correlations — indistinguishable in
# depth-map quality and ~2-3x faster.  Module-level so callers can flip.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

# Double-buffer the per-tile window DMA across the j (lane-tile) sweep:
# while tile j computes, tile j+1's window streams into the other scratch
# slot — the sync start();wait() otherwise serializes HBM latency against
# the band matmuls every tile (r2 measured stage-2 at only 53% MXU).
# Row starts (j == 0) stay synchronous (the next row's origins live in a
# different SMEM block), hiding (nw-1)/nw of the window fetches.
# Env safety valve: DMVSNET_DMA_PIPELINE=0 restores the synchronous DMA
# (in case a toolchain change rejects the revolving-slot pattern).
import os as _os  # noqa: E402

DMA_PIPELINE = _os.environ.get("DMVSNET_DMA_PIPELINE", "1") != "0"


def _row_group(c: int, min_rows: int | None = None) -> tuple[int, int]:
    """(G rows packed per 128-sublane slot, q packed blocks per window)."""
    if 128 % c:
        raise ValueError(f"channel count {c} must divide 128")
    g = 128 // c
    mr = MIN_ROWS if min_rows is None else min_rows
    q = (mr + g - 1) // g + 1  # +1 block pays for rb alignment loss
    return g, q


def analytic_cost(
    h: int, w: int, c: int, dpl: int,
    cwin: int = C_WIN, min_rows: int | None = None,
) -> tuple[float, float]:
    """(flops, bytes) ONE view's forward kernel actually executes/moves.

    XLA's cost model cannot see inside the pallas custom call and, worse,
    sums BOTH branches of the `_span_ok` lax.cond (the dead XLA-gather
    fallback inflates flops and bytes) — r3's stagetime printed warp
    stage-2 at "1570% of roofline" because of it (VERDICT r3).  This
    derives the real numbers from the kernel structure:

      flops  = band matmuls: per (plane-group, tile) q blocks of
               (128, cwin) @ (cwin, P) per plane, 2*128*cwin*P flops each
               (the ref-multiply + group reduce adds ~128*P*3 per plane —
               negligible, included for completeness);
      bytes  = window DMA (q*(128 x cwin) fp32 per plane-group tile,
               shared across the pd planes) + the ref tile re-fetched per
               plane-group + coords + output writes + the one-time source
               packing / reference tiling passes.
    """
    g, q = _row_group(c, min_rows)
    _, q_pack = _row_group(c)
    p = BR * BL
    wp = max(_round_up(w, BL), C_WIN)
    hp = _round_up(max(h, (q_pack + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    pd = PD if dpl % PD == 0 else (2 if dpl % 2 == 0 else 1)
    groups = (dpl // pd) * nh * nw
    flops = groups * pd * (q * 2 * 128 * cwin * p + 3 * 128 * p)
    win_bytes = groups * q * 128 * cwin * 4
    ref_bytes = groups * 128 * p * 4
    coord_bytes = dpl * nh * 2 * nw * p * 4
    out_bytes = dpl * nh * 2 * nw * p * 4
    pack_bytes = 2 * c * hp * wp * 4 + 2 * nh * nw * 128 * p * 4
    return float(flops), float(
        win_bytes + ref_bytes + coord_bytes + out_bytes + pack_bytes
    )


def _make_kernel(c: int, pd: int, cwin: int, min_rows: int | None = None):
    g, q = _row_group(c, min_rows)
    p = BR * BL

    pipelined = DMA_PIPELINE

    def kernel(orig_ref, coord_ref, src_hbm, ref_ref, out_ref, win_ref, sem):
        # coord/out blocks hold PD planes x a whole row of tiles (j is the
        # innermost grid axis, so blocks stay VMEM-resident while j
        # sweeps); each instance reads/writes its tile's sublane pair
        # dynamically, and PD planes share ONE window DMA (adjacent
        # hypotheses project only a few pixels apart).
        ix = pl.program_id(2)

        def win_copy(j, slot):
            rbj = orig_ref[0, 0, j, 0]
            c0j = pl.multiple_of(orig_ref[0, 0, j, 1], 128)
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(rbj, q), :, pl.ds(c0j, cwin)],
                win_ref.at[slot], sem.at[slot],
            )

        rb = orig_ref[0, 0, ix, 0]
        c0 = pl.multiple_of(orig_ref[0, 0, ix, 1], 128)  # aligned by wrapper
        if pipelined:
            slot = jax.lax.rem(ix, 2)
            nwj = pl.num_programs(2)

            @pl.when(ix == 0)
            def _first():
                win_copy(ix, slot).start()

            win_copy(ix, slot).wait()

            @pl.when(ix + 1 < nwj)
            def _prefetch():
                win_copy(ix + 1, jax.lax.rem(ix + 1, 2)).start()

        else:
            slot = 0
            cp = win_copy(ix, 0)
            cp.start()
            cp.wait()

        cc = (c0 + jax.lax.broadcasted_iota(jnp.int32, (cwin, p), 0)).astype(
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
                    win_ref[slot, j], rx, preferred_element_type=jnp.float32,
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


def _make_grad_ref_kernel(c: int, pd: int, cwin: int, min_rows: int | None = None):
    """Adjoint wrt the tiled reference: for one (i, j) tile, accumulate
    sum_d cot[d,g(s),p] * res[d,s,p] * wy[d,s,p] / half over all depth
    groups (dg is the INNERMOST grid axis so the output block stays
    VMEM-resident and revisiting accumulates)."""
    g, q = _row_group(c, min_rows)  # MUST match the caller's scratch tier:
    # with min_rows=12 at c=32 the scratch is (q=4, 128, cwin) while the
    # default tier would DMA q=5 row-blocks — a compile-time Mosaic
    # 'enqueue_dma shape mismatch' on hardware (hit in round 3's chiprun).
    p = BR * BL

    def kernel(orig_ref, coord_ref, cot_ref, src_hbm, out_ref, win_ref, sem):
        jx = pl.program_id(1)
        dg = pl.program_id(2)
        rb = orig_ref[0, 0, jx, 0]
        c0 = pl.multiple_of(orig_ref[0, 0, jx, 1], 128)
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(rb, q), :, pl.ds(c0, cwin)], win_ref, sem
        )
        cp.start()
        cp.wait()

        cc = (c0 + jax.lax.broadcasted_iota(jnp.int32, (cwin, p), 0)).astype(
            jnp.float32
        )
        r0f = (rb * g).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (g * c, p), 0)
        l_of_sub = (sub // c).astype(jnp.float32)
        half = c // 2
        gmask0 = ((sub % c) < half).astype(jnp.float32)

        acc = jnp.zeros((g * c, p), jnp.float32)
        for pdi in range(pd):
            px = coord_ref[pdi, 0, pl.ds(2 * jx, 1), :]
            py = coord_ref[pdi, 0, pl.ds(2 * jx + 1, 1), :]
            rx = jnp.maximum(0.0, 1.0 - jnp.abs(px - cc))
            cot0 = cot_ref[pdi, 0, pl.ds(2 * jx, 1), :]
            cot1 = cot_ref[pdi, 0, pl.ds(2 * jx + 1, 1), :]
            csel = (cot0 * gmask0 + cot1 * (1.0 - gmask0)) / half
            for j in range(q):
                res = jnp.dot(
                    win_ref[j], rx, preferred_element_type=jnp.float32,
                    precision=MATMUL_PRECISION,
                )
                wyb = jnp.maximum(
                    0.0, 1.0 - jnp.abs(py - (r0f + j * g + l_of_sub))
                )
                acc = acc + res * wyb * csel

        @pl.when(dg == 0)
        def _init():
            out_ref[0, 0] = acc

        @pl.when(dg > 0)
        def _accum():
            out_ref[0, 0] = out_ref[0, 0] + acc

    return kernel


def _make_grad_src_kernel(c: int, pd: int, cwin: int, min_rows: int | None = None):
    """Adjoint wrt the packed source: per (dg, i, j) instance, the window
    gradient is cot_res @ Rx^T (lanes-contraction dot), read-modify-
    written into the HBM grad buffer.  Correct because the TPU grid
    executes sequentially and the write is awaited inside the body."""
    g, q = _row_group(c, min_rows)
    p = BR * BL

    def kernel(orig_ref, coord_ref, cot_ref, ref_ref, z_ref, out_hbm,
               win_ref, sem_i, sem_o):
        del z_ref  # aliased with out_hbm (carries the zero initialization)
        ix = pl.program_id(2)
        rb = orig_ref[0, 0, ix, 0]
        c0 = pl.multiple_of(orig_ref[0, 0, ix, 1], 128)
        rd = pltpu.make_async_copy(
            out_hbm.at[pl.ds(rb, q), :, pl.ds(c0, cwin)], win_ref, sem_i
        )
        rd.start()
        rd.wait()

        cc = (c0 + jax.lax.broadcasted_iota(jnp.int32, (cwin, p), 0)).astype(
            jnp.float32
        )
        r0f = (rb * g).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (g * c, p), 0)
        l_of_sub = (sub // c).astype(jnp.float32)
        half = c // 2
        gmask0 = ((sub % c) < half).astype(jnp.float32)
        refv = ref_ref[0, 0].astype(jnp.float32)

        grads = [win_ref[j] for j in range(q)]
        for pdi in range(pd):
            px = coord_ref[pdi, 0, pl.ds(2 * ix, 1), :]
            py = coord_ref[pdi, 0, pl.ds(2 * ix + 1, 1), :]
            rx = jnp.maximum(0.0, 1.0 - jnp.abs(px - cc))
            cot0 = cot_ref[pdi, 0, pl.ds(2 * ix, 1), :]
            cot1 = cot_ref[pdi, 0, pl.ds(2 * ix + 1, 1), :]
            csel = (cot0 * gmask0 + cot1 * (1.0 - gmask0)) / half
            for j in range(q):
                wyb = jnp.maximum(
                    0.0, 1.0 - jnp.abs(py - (r0f + j * g + l_of_sub))
                )
                cot_res = refv * wyb * csel  # (G*C, P)
                grads[j] = grads[j] + jax.lax.dot_general(
                    cot_res, rx, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MATMUL_PRECISION,
                )
        for j in range(q):
            win_ref[j] = grads[j]
        wr = pltpu.make_async_copy(
            win_ref, out_hbm.at[pl.ds(rb, q), :, pl.ds(c0, cwin)], sem_o
        )
        wr.start()
        wr.wait()

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


def _prep(src_feat, rel_proj, depth_values, cwin, min_rows=None):
    """Shared forward/backward preamble: padded sizes, per-tile coords,
    window origins, and the row-packed transposed source.

    The packed layout / padded sizes always use the MIN_ROWS q (so every
    row tier shares one packing); only the window origin clip uses the
    tier's (smaller) q."""
    h, w, c = src_feat.shape
    g, q_pack = _row_group(c)
    g, q = _row_group(c, min_rows)
    dpl = depth_values.shape[0]
    wp = max(_round_up(w, BL), C_WIN)  # >= C_WIN so window slices stay in-bounds
    hp = _round_up(max(h, (q_pack + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    p = BR * BL

    # group-major channel permutation: [0,2,4,...,1,3,5,...].
    # Channels move to the MAJOR axis before any pad/copy: a materialized
    # (..., c) intermediate in the default (pallas-boundary) layout pads
    # its sub-128 trailing dim to 128 lanes — 16x HBM traffic at c=8.
    perm = list(range(0, c, 2)) + list(range(1, c, 2))
    src_cm = jnp.transpose(src_feat, (2, 0, 1))[jnp.array(perm)]  # (c, h, w), w minor
    srcp = jnp.pad(src_cm, ((0, 0), (0, hp - h), (0, wp - w)))

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
        0, wp - cwin,
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

    # row-packed + transposed source: (H/G, G*C, Wp), sublane s of block R
    # holding source row R*g + s//c, channel s%c — built channel-major so
    # every intermediate keeps Wp on lanes
    src_t = srcp.reshape(c, hp // g, g, wp).transpose(1, 2, 0, 3).reshape(
        hp // g, g * c, wp
    )
    return origin, coords, src_t, (g, q, dpl, wp, hp, nh, nw, pd, perm)


def _span_ok(
    rel_proj: jnp.ndarray, depth_values: jnp.ndarray, h: int, w: int, c: int,
    cwin: int = C_WIN, min_rows: int | None = None,
) -> jnp.ndarray:
    """True iff every tile's projected taps fit its kernel window.

    Replicates _prep's window-origin arithmetic (same clip/pad/floor), then
    checks the HIGH side: the highest REAL-data column (row) any pixel of a
    (plane-group, tile) touches must lie inside [c0, c0+C_WIN)
    ([rb*g, rb*g+q*g)).  The low side is covered by construction (origins
    are floored minima).  Out-of-image taps carry zero weight or read the
    zero padding, so they impose no constraint.  Cheap: two reduces over
    the coordinate grids, no tiling transposes.
    """
    g, q_pack = _row_group(c)
    g, q = _row_group(c, min_rows)
    dpl = depth_values.shape[0]
    wp = max(_round_up(w, BL), C_WIN)  # >= C_WIN so window slices stay in-bounds
    hp = _round_up(max(h, (q_pack + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    px, py = geometry.plane_sweep_coords(
        rel_proj[None], depth_values[None], h, w
    )
    pxc = jnp.pad(
        jnp.clip(px[0], -2.0, float(wp) + 1.0),
        ((0, 0), (0, hp - h), (0, wp - w)), constant_values=float(wp) + 1.0,
    )
    pyc = jnp.pad(
        jnp.clip(py[0], -2.0, float(hp) + 1.0),
        ((0, 0), (0, hp - h), (0, wp - w)), constant_values=float(hp) + 1.0,
    )
    pd = PD if dpl % PD == 0 else (2 if dpl % 2 == 0 else 1)

    def tiles(a):
        return a.reshape(dpl // pd, pd, nh, BR, nw, BL)

    c0 = jnp.clip(
        (jnp.floor(jnp.min(tiles(pxc), axis=(1, 3, 5))).astype(jnp.int32) - 1)
        // BL * BL,
        0, wp - cwin,
    )
    rb = jnp.clip(
        (jnp.floor(jnp.min(tiles(pyc), axis=(1, 3, 5))).astype(jnp.int32) - 1)
        // g,
        0, hp // g - q,
    )
    hx = jnp.where(
        pxc < w, jnp.minimum(jnp.floor(pxc) + 1.0, float(w - 1)), -1e9
    )
    hy = jnp.where(
        pyc < h, jnp.minimum(jnp.floor(pyc) + 1.0, float(h - 1)), -1e9
    )
    vx = jnp.max(tiles(hx), axis=(1, 3, 5))
    vy = jnp.max(tiles(hy), axis=(1, 3, 5))
    return jnp.all(vx - c0.astype(jnp.float32) < cwin) & jnp.all(
        vy - (rb * g).astype(jnp.float32) < q * g
    )


def _tile_out(x: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """(D, H, W, 2) -> the kernel's tiled layout (D, nh, 2nw, P); the
    exact inverse of _untile_out (used by the XLA fallback branch so both
    cond branches return identical shapes)."""
    d, h, w, _ = x.shape
    return _tile_out_cm(jnp.moveaxis(x, -1, 1), h, w, nh, nw)


def _tile_out_cm(x: jnp.ndarray, h: int, w: int, nh: int, nw: int) -> jnp.ndarray:
    """(D, 2, H, W) channel-major correlation -> tiled (D, nh, 2nw, P)."""
    d = x.shape[0]
    hp, wp = nh * BR, nw * BL
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    t = _tile_lanes(xp, nh, nw)  # (D, 2, nh, nw, P)
    return t.transpose(0, 2, 3, 1, 4).reshape(d, nh, 2 * nw, BR * BL)


def _corr_view_tiled(
    src_feat: jnp.ndarray,
    ref_t: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    interpret: bool,
    cwin: int = C_WIN,
    min_rows: int | None = None,
) -> jnp.ndarray:
    """One view's correlation in the TILED output layout (D, nh, 2nw, P).

    ref_t is the pre-tiled reference (see plane_sweep_corr_view); callers
    aggregating several views share it and untile the SUM once.
    """
    h, w, c = src_feat.shape
    origin, coords, src_t, dims = _prep(
        src_feat, rel_proj, depth_values, cwin, min_rows
    )
    g, q, dpl, wp, hp, nh, nw, pd, _ = dims
    p = BR * BL

    grid = (dpl // pd, nh, nw)
    kernel = _make_kernel(c, pd, cwin, min_rows)
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
            pltpu.VMEM((2, q, g * c, cwin), jnp.float32),  # revolving slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(origin, coords, src_t, ref_t)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _corr_view_tiled_diff(interpret, cwin, min_rows, src_feat, ref_t, rel_proj, depth_values):
    """_corr_view_tiled with a hand-written VJP: adjoint Pallas kernels
    for the source (transposed band matmul, sequentially accumulated into
    HBM windows) and the tiled reference (block-revisited accumulation
    over depth groups).  Projections and depth hypotheses get ZERO
    cotangents — the sampling grid carries no gradient, matching the XLA
    path's stop_gradient (reference networks/module.py:222)."""
    return _corr_view_tiled(
        src_feat, ref_t, rel_proj, depth_values, interpret, cwin, min_rows
    )


def _corr_view_tiled_fwd(interpret, cwin, min_rows, src_feat, ref_t, rel_proj, depth_values):
    out = _corr_view_tiled(
        src_feat, ref_t, rel_proj, depth_values, interpret, cwin, min_rows
    )
    return out, (src_feat, ref_t, rel_proj, depth_values)


def _corr_view_tiled_bwd(interpret, cwin, min_rows, residuals, cot):
    src_feat, ref_t, rel_proj, depth_values = residuals
    h, w, c = src_feat.shape
    origin, coords, src_t, dims = _prep(
        src_feat, rel_proj, depth_values, cwin, min_rows
    )
    g, q, dpl, wp, hp, nh, nw, pd, perm = dims
    p = BR * BL
    cot = cot.astype(jnp.float32)

    grad_ref_t = pl.pallas_call(
        _make_grad_ref_kernel(c, pd, cwin, min_rows),
        grid=(nh, nw, dpl // pd),
        in_specs=[
            pl.BlockSpec(
                (1, 1, nw, 2), lambda i, j, d: (d, i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((pd, 1, 2 * nw, p), lambda i, j, d: (d, i, 0, 0)),
            pl.BlockSpec((pd, 1, 2 * nw, p), lambda i, j, d: (d, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g * c, p), lambda i, j, d: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((nh, nw, g * c, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q, g * c, cwin), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(origin, coords, cot, src_t)

    grad_src_t = pl.pallas_call(
        _make_grad_src_kernel(c, pd, cwin, min_rows),
        grid=(dpl // pd, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, 1, nw, 2), lambda d, i, j: (d, i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((pd, 1, 2 * nw, p), lambda d, i, j: (d, i, 0, 0)),
            pl.BlockSpec((pd, 1, 2 * nw, p), lambda d, i, j: (d, i, 0, 0)),
            pl.BlockSpec((1, 1, g * c, p), lambda d, i, j: (i, j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((hp // g, g * c, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q, g * c, cwin), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(origin, coords, cot, ref_t, jnp.zeros((hp // g, g * c, wp), jnp.float32))

    # invert the source packing: (H/G, G*C, Wp) -> (c, hp, wp) channel-major
    # -> crop + inverse perm + back to channels-last
    gs = grad_src_t.reshape(hp // g, g, c, wp).transpose(2, 0, 1, 3)
    gs = gs.reshape(c, hp, wp)[:, :h, :w]
    inv_perm = [0] * c
    for i, pi in enumerate(perm):
        inv_perm[pi] = i
    grad_src = gs[jnp.array(inv_perm)].transpose(1, 2, 0)
    return (
        grad_src, grad_ref_t,
        jnp.zeros_like(rel_proj), jnp.zeros_like(depth_values),
    )


_corr_view_tiled_diff.defvjp(_corr_view_tiled_fwd, _corr_view_tiled_bwd)


def _corr_view_tiled_safe(
    interpret, src_feat, ref_feat, ref_t, rel_proj, depth_values
):
    """Kernel when the geometry fits, XLA gather path when it doesn't.

    The kernel windows assume bounded per-tile projected spans (wide
    baselines / strong rotations — e.g. the T&T 11-view interval_ratio-3
    regime — can exceed them, which would silently zero taps).  The span
    check routes each (view, plane-set) through lax.cond: the offending
    call falls back to the exact XLA path, tiled into the kernel's output
    layout so either branch aggregates identically.  Differentiation works
    through both branches (custom VJP / plain autodiff respectively).
    """
    from dmvsnet_tpu.ops import warp as warp_ops

    h, w, c = src_feat.shape
    g, q = _row_group(c)
    wp = max(_round_up(w, BL), C_WIN)  # >= C_WIN so window slices stay in-bounds
    hp = _round_up(max(h, (q + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    # the narrow-rows tier only differs from the 16-row one when it drops
    # a whole window block (q shrinks) — skip the extra branch otherwise
    row_tiered = _row_group(c, MIN_ROWS_FAST)[1] < q
    ok_fast12 = _span_ok(
        rel_proj, depth_values, h, w, c, C_WIN_FAST, MIN_ROWS_FAST
    ) if row_tiered else jnp.bool_(False)
    ok_fast = _span_ok(rel_proj, depth_values, h, w, c, C_WIN_FAST)
    ok = _span_ok(rel_proj, depth_values, h, w, c, C_WIN)

    def pallas_fast12():
        return _corr_view_tiled_diff(
            interpret, C_WIN_FAST, MIN_ROWS_FAST,
            src_feat, ref_t, rel_proj, depth_values
        )

    def pallas_fast():
        return _corr_view_tiled_diff(
            interpret, C_WIN_FAST, None, src_feat, ref_t, rel_proj, depth_values
        )

    def pallas_wide():
        return _corr_view_tiled_diff(
            interpret, C_WIN, None, src_feat, ref_t, rel_proj, depth_values
        )

    # The fallback is (a) channel-major — identical math to
    # group_correlation(warp(src), ref) but every intermediate keeps W on
    # the lane axis (the flat-index form's backward residuals pad 64-128x:
    # 364 GB at the r4 train compile) — and (b) jax.checkpoint'ed: the
    # gather indices would otherwise be SAVED RESIDUALS, one padded-s32
    # 1.25 GB array per tap per instance, all simultaneously live at the
    # fwd/bwd boundary (the 116 GB of the second r4 OOM; these branches
    # are dead on DTU geometries but their residuals are still allocated).
    # Checkpointing recomputes them inside each instance's backward region
    # where the temps are transient and buffer-shared across instances.
    @jax.checkpoint
    def _fallback_cm(src_feat, ref_feat, rel_proj, depth_values):
        corr_cm = warp_ops.plane_sweep_corr_cm(
            src_feat, ref_feat, rel_proj, depth_values
        )  # (2, D, H, W)
        return _tile_out_cm(
            jnp.moveaxis(corr_cm, 0, 1).astype(jnp.float32), h, w, nh, nw
        )

    def xla_branch():
        return _fallback_cm(src_feat, ref_feat, rel_proj, depth_values)

    def wide_or_xla():
        return jax.lax.cond(ok, pallas_wide, xla_branch)

    def fast_or_below():
        return jax.lax.cond(ok_fast, pallas_fast, wide_or_xla)

    if not row_tiered:
        return fast_or_below()
    return jax.lax.cond(ok_fast12, pallas_fast12, fast_or_below)


def _tile_ref(ref_feat: jnp.ndarray) -> jnp.ndarray:
    """Pre-tile the reference features for _corr_view_tiled:
    (H, W, C) -> (nh, nw, G*C, P), channels group-major and tiled G times."""
    h, w, c = ref_feat.shape
    g, q = _row_group(c)
    wp = max(_round_up(w, BL), C_WIN)  # >= C_WIN so window slices stay in-bounds
    hp = _round_up(max(h, (q + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    perm = list(range(0, c, 2)) + list(range(1, c, 2))
    # channel-major before the pad so no sub-128 trailing dim materializes
    ref_cm = jnp.transpose(ref_feat, (2, 0, 1))[jnp.array(perm)]  # (c, h, w)
    refp = jnp.pad(ref_cm, ((0, 0), (0, hp - h), (0, wp - w)))
    return jnp.tile(
        jnp.moveaxis(_tile_lanes(refp, nh, nw), 0, 2), (1, 1, g, 1)
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
    # the kernel is fp32-typed end to end (VMEM scratch, DMA windows,
    # outputs); bf16 callers (mixed-precision training) are upcast here —
    # the band matmuls already run one-bf16-pass internally via DEFAULT
    # precision, so this costs layout only, and autodiff returns the
    # cotangents in the caller's dtype through the astype
    src_feat = src_feat.astype(jnp.float32)
    ref_feat = ref_feat.astype(jnp.float32)
    depth_values = depth_values.astype(jnp.float32)
    ref_t = _tile_ref(ref_feat)
    out = _corr_view_tiled_safe(
        interpret, src_feat, ref_feat, ref_t, rel_proj, depth_values
    )
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
    # fp32 kernel contract (see corr_view): upcast bf16 training inputs
    features = [f.astype(jnp.float32) for f in features]
    depth_values = depth_values.astype(jnp.float32)
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
            corr = _corr_view_tiled_safe(
                interpret, feats_b[v], feats_b[0], ref_t, rel, dv_b
            )
            total = corr if total is None else total + corr
        return _untile_out(total, h, w)

    outs = []
    for bi in range(b):
        outs.append(
            one_batch([f[bi] for f in features], fused[bi], depth_values[bi])
        )
    return jnp.stack(outs)
