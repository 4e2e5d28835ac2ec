"""Epipolar-rectified 1-D plane sweep as Pallas TPU kernels.

The 2-D warp kernel (warp_correlate.py) pays q band matmuls per
(depth plane, tile) because each plane re-resamples rows: the y-window
must cover the tile's rows + rotation tilt + plane drift (q = 3 at c=16,
4-5 at c=32).  After epipolar rectification (core/epipolar.py) matched
points share scanlines EXACTLY, so the per-plane work is a pure 1-D lerp
along lanes: the window holds only the tile's own 8 rows — q collapses
to 8/G (1 at c=16, 2 at c=32), the row weights become a STATIC
row-selection mask, and no py coordinates exist at all.

Cost model per (view, stage): one 2-D resample of src and ref each
(amortized over all D planes), D x (8/G) band matmuls, and one D-folded
resample back to the original grid.  At the DTU-eval stage-2 shape that
is ~(32*1 + overhead) block-matmuls/tile against the 2-D kernel's 32*3.

Approximation: the two extra resamples low-pass features and blend the
checkerboard hypothesis offsets (see core/epipolar.py docstring); this
path is therefore an EVAL-TIME option (MVSNet flag), gated per
(view, stage) by validity checks with fallback to the exact 2-D kernel.
No custom VJP — training uses the 2-D kernel path.

Layout doctrine follows warp_correlate.py: pixels on lanes everywhere,
channel-major packing, 128-aligned window origins.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmvsnet_tpu.core import epipolar, geometry
from dmvsnet_tpu.ops.pallas import warp_correlate as wc
from dmvsnet_tpu.ops.pallas.warp_correlate import (
    BL,
    BR,
    C_WIN_FAST,
    _round_up,
    _row_group,
    _tile_lanes,
    _tile_ref,
    _untile_out,
)

# rectification sanity bounds: scale factors of the similarity fits must
# stay near 1 (resolution loss / blowup), and the epipole must be well
# outside the image (G-distortion), else fall back to the 2-D kernel.
SCALE_MIN, SCALE_MAX = 0.5, 2.0
EPIPOLE_MARGIN = 1.2  # min epipole distance in image diagonals

# interpret-mode default for calls that don't pass `interpret` (the model
# path): lets CPU tests drive the full cascade through these kernels.
INTERPRET = False


# ---------------------------------------------------------------------------
# generic tiled bilinear resample kernel (one "plane": depth-independent)
# ---------------------------------------------------------------------------

def _make_resample_kernel(c: int, cwin: int, q: int):
    g = 128 // c
    p = BR * BL

    def kernel(orig_ref, coord_ref, src_hbm, out_ref, win_ref, sem):
        jx = pl.program_id(1)

        def win_copy(j, slot):
            rbj = orig_ref[0, j, 0]
            c0j = pl.multiple_of(orig_ref[0, j, 1], 128)
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(rbj, q), :, pl.ds(c0j, cwin)],
                win_ref.at[slot], sem.at[slot],
            )

        rb = orig_ref[0, jx, 0]
        c0 = pl.multiple_of(orig_ref[0, jx, 1], 128)
        slot = jax.lax.rem(jx, 2)

        @pl.when(jx == 0)
        def _first():
            win_copy(jx, slot).start()

        win_copy(jx, slot).wait()

        @pl.when(jx + 1 < pl.num_programs(1))
        def _prefetch():
            win_copy(jx + 1, jax.lax.rem(jx + 1, 2)).start()

        px = coord_ref[0, pl.ds(2 * jx, 1), :]      # (1, P)
        py = coord_ref[0, pl.ds(2 * jx + 1, 1), :]
        cc = (c0 + jax.lax.broadcasted_iota(jnp.int32, (cwin, p), 0)).astype(
            jnp.float32
        )
        rx = jnp.maximum(0.0, 1.0 - jnp.abs(px - cc))
        r0f = (rb * g).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (g * c, p), 0)
        l_of_sub = (sub // c).astype(jnp.float32)

        acc = jnp.zeros((g * c, p), jnp.float32)
        for j in range(q):
            res = jnp.dot(
                win_ref[slot, j], rx, preferred_element_type=jnp.float32,
                precision=wc.MATMUL_PRECISION,
            )
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - (r0f + j * g + l_of_sub)))
            acc = acc + res * wy
        # reduce the g packed rows per channel: Sel[ch, s] = (s % c == ch)
        ch_i = jax.lax.broadcasted_iota(jnp.int32, (c, g * c), 0)
        s_i = jax.lax.broadcasted_iota(jnp.int32, (c, g * c), 1)
        sel = (s_i % c == ch_i).astype(jnp.float32)
        out_ref[0, 0] = jnp.dot(
            sel, acc, preferred_element_type=jnp.float32,
            precision=wc.MATMUL_PRECISION,
        )

    return kernel


def _pack_rows(img_cm: jnp.ndarray, g: int) -> jnp.ndarray:
    """(c, Hp, Wp) channel-major -> (Hp/G, G*C, Wp) row-packed."""
    c, hp, wp = img_cm.shape
    return img_cm.reshape(c, hp // g, g, wp).transpose(1, 2, 0, 3).reshape(
        hp // g, g * c, wp
    )


def _prep_resample(px, py, h_src, w_src, c, cwin):
    """Coords/origins for a depth-independent resample onto an (Ho, Wo)
    output grid (px/py shaped (Ho, Wo), sampling an (h_src, w_src, c)
    image).  Mirrors warp_correlate._prep with dpl=1."""
    g, q = _row_group(c)
    ho, wo = px.shape
    wp = max(_round_up(w_src, BL), cwin)
    hp = _round_up(max(h_src, (q + 1) * g), max(BR, g))
    wop = _round_up(wo, BL)
    hop = _round_up(ho, BR)
    nh, nw = hop // BR, wop // BL
    p = BR * BL

    px = jnp.clip(px, -2.0, float(wp) + 1.0)
    py = jnp.clip(py, -2.0, float(hp) + 1.0)
    px = jnp.pad(px, ((0, hop - ho), (0, wop - wo)),
                 constant_values=float(wp) + 1.0)
    py = jnp.pad(py, ((0, hop - ho), (0, wop - wo)),
                 constant_values=float(hp) + 1.0)
    px_t = _tile_lanes(px, nh, nw)   # (nh, nw, P)
    py_t = _tile_lanes(py, nh, nw)

    c0 = jnp.clip(
        (jnp.floor(jnp.min(px_t, axis=2)).astype(jnp.int32) - 1) // BL * BL,
        0, wp - cwin,
    )
    rb = jnp.clip(
        (jnp.floor(jnp.min(py_t, axis=2)).astype(jnp.int32) - 1) // g,
        0, hp // g - q,
    )
    origin = jnp.stack([rb, c0], axis=-1)             # (nh, nw, 2)
    coords = jnp.stack([px_t, py_t], axis=2).reshape(nh, 2 * nw, p)
    return origin, coords, (g, q, hp, wp, hop, wop, nh, nw)


def _resample_span_ok(px, py, h_src, w_src, c, cwin):
    """True iff every tile's taps fit its window (coords given)."""
    g, q = _row_group(c)
    ho, wo = px.shape
    wp = max(_round_up(w_src, BL), cwin)
    hp = _round_up(max(h_src, (q + 1) * g), max(BR, g))
    wop, hop = _round_up(wo, BL), _round_up(ho, BR)
    nh, nw = hop // BR, wop // BL
    pxc = jnp.pad(jnp.clip(px, -2.0, float(wp) + 1.0),
                  ((0, hop - ho), (0, wop - wo)),
                  constant_values=float(wp) + 1.0)
    pyc = jnp.pad(jnp.clip(py, -2.0, float(hp) + 1.0),
                  ((0, hop - ho), (0, wop - wo)),
                  constant_values=float(hp) + 1.0)

    def tiles(a):
        return a.reshape(nh, BR, nw, BL)

    c0 = jnp.clip(
        (jnp.floor(jnp.min(tiles(pxc), axis=(1, 3))).astype(jnp.int32) - 1)
        // BL * BL, 0, wp - cwin,
    )
    rb = jnp.clip(
        (jnp.floor(jnp.min(tiles(pyc), axis=(1, 3))).astype(jnp.int32) - 1)
        // g, 0, hp // g - q,
    )
    hx = jnp.where(pxc < w_src,
                   jnp.minimum(jnp.floor(pxc) + 1.0, float(w_src - 1)), -1e9)
    hy = jnp.where(pyc < h_src,
                   jnp.minimum(jnp.floor(pyc) + 1.0, float(h_src - 1)), -1e9)
    vx = jnp.max(tiles(hx), axis=(1, 3))
    vy = jnp.max(tiles(hy), axis=(1, 3))
    return jnp.all(vx - c0.astype(jnp.float32) < cwin) & jnp.all(
        vy - (rb * g).astype(jnp.float32) < q * g
    )


def resample_tiled(
    img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
    cwin: int = C_WIN_FAST, interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear-resample (H, W, C) at per-pixel (px, py) (zero padding)
    via the band-matmul kernel.  Channels must divide 128.

    Returns (Ho, Wo, C) where (Ho, Wo) = px.shape.
    """
    h, w, c = img.shape
    ho, wo = px.shape
    g, q = _row_group(c)
    origin, coords, dims = _prep_resample(px, py, h, w, c, cwin)
    g, q, hp, wp, hop, wop, nh, nw = dims
    p = BR * BL

    img_cm = jnp.transpose(img, (2, 0, 1))
    img_cm = jnp.pad(img_cm, ((0, 0), (0, hp - h), (0, wp - w)))
    src_t = _pack_rows(img_cm, g)

    out = pl.pallas_call(
        _make_resample_kernel(c, cwin, q),
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((1, nw, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * nw, p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, c, p), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nh, nw, c, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, q, g * c, cwin), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(origin, coords, src_t)

    # (nh, nw, c, P) -> (Ho, Wo, C)
    out = out.reshape(nh, nw, c, BR, BL).transpose(2, 0, 3, 1, 4)
    out = out.reshape(c, hop, wop)[:, :ho, :wo]
    return jnp.transpose(out, (1, 2, 0))


# ---------------------------------------------------------------------------
# the 1-D sweep + correlate kernel
# ---------------------------------------------------------------------------

def _make_sweep1d_kernel(c: int, pd: int, cwin: int):
    g = 128 // c
    # Window blocks covering the tile's 8 rows.  Two packing regimes:
    #   g <= BR: q1 = BR/g blocks exactly span the tile (rows offset 0);
    #   g >  BR (c=8 -> g=16): ONE block holds g/BR tiles' rows, so q1=1
    #     and the tile's rows start at offset (ix*BR) % g inside it — the
    #     static row-selection mask gains a program-id-derived offset.
    #     This is what lets the 1-D sweep engage at stage 3 (c=8), which
    #     the BR%g==0 form statically excluded (VERDICT r4 #4c).
    q1 = max(1, BR // g)
    p = BR * BL

    def kernel(orig_ref, coord_ref, src_hbm, ref_ref, out_ref, win_ref, sem):
        ix = pl.program_id(1)
        jx = pl.program_id(2)
        rb0 = ix * BR // g          # first packed row-block of this tile
        off = ix * BR - rb0 * g     # row offset inside that block

        def win_copy(j, slot):
            c0j = pl.multiple_of(orig_ref[0, 0, j, 1], 128)
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(rb0, q1), :, pl.ds(c0j, cwin)],
                win_ref.at[slot], sem.at[slot],
            )

        c0 = pl.multiple_of(orig_ref[0, 0, jx, 1], 128)
        slot = jax.lax.rem(jx, 2)

        @pl.when(jx == 0)
        def _first():
            win_copy(jx, slot).start()

        win_copy(jx, slot).wait()

        @pl.when(jx + 1 < pl.num_programs(2))
        def _prefetch():
            win_copy(jx + 1, jax.lax.rem(jx + 1, 2)).start()

        cc = (c0 + jax.lax.broadcasted_iota(jnp.int32, (cwin, p), 0)).astype(
            jnp.float32
        )
        sub = jax.lax.broadcasted_iota(jnp.int32, (g * c, p), 0)
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (g * c, p), 1) // BL
        half = c // 2
        gmask0 = ((sub % c) < half).astype(jnp.float32)
        refv = ref_ref[0, 0].astype(jnp.float32)   # (G*C, P) channels tiled

        for pdi in range(pd):
            px = coord_ref[pdi, 0, pl.ds(jx, 1), :]   # (1, P)
            rx = jnp.maximum(0.0, 1.0 - jnp.abs(px - cc))
            corr0 = jnp.zeros((1, p), jnp.float32)
            corr1 = jnp.zeros((1, p), jnp.float32)
            for j in range(q1):
                res = jnp.dot(
                    win_ref[slot, j], rx, preferred_element_type=jnp.float32,
                    precision=wc.MATMUL_PRECISION,
                )
                # STATIC row selection: sublane s holds row off + j*g + s//c
                # of the tile; lane p belongs to tile row p//BL (off is 0
                # whenever g <= BR)
                rmask = (j * g + sub // c - off == lane_row).astype(jnp.float32)
                z = res * refv * rmask
                corr0 = corr0 + jnp.sum(z * gmask0, axis=0, keepdims=True)
                corr1 = corr1 + jnp.sum(z * (1.0 - gmask0), axis=0,
                                        keepdims=True)
            out_ref[pdi, 0, pl.ds(2 * jx, 1), :] = corr0 / half
            out_ref[pdi, 0, pl.ds(2 * jx + 1, 1), :] = corr1 / half

    return kernel


def _sweep1d(
    src_rect: jnp.ndarray, ref_t: jnp.ndarray, px: jnp.ndarray,
    cwin: int = C_WIN_FAST, interpret: bool = False,
) -> jnp.ndarray:
    """Per-plane 1-D lerp + 2-group correlation on the rect grid.

    src_rect: (Hr, Wr, C) rectified source, GROUP-MAJOR channel order
      (the same perm warp_correlate uses);
    ref_t: pre-tiled rectified reference (nh, nw, G*C, P);
    px: (D, Hr, Wr) per-plane lane coordinates.

    Returns the tiled correlation (D, nh, 2nw, P).
    """
    hr, wr, c = src_rect.shape
    g, q_pack = _row_group(c)
    if BR % g and g % BR:
        raise ValueError(f"c={c}: G={g} and BR={BR} must nest for static rows")
    q1 = max(1, BR // g)
    dpl = px.shape[0]
    # padded sizes must match _tile_ref's so ref_t tiles align
    wp = max(_round_up(wr, BL), wc.C_WIN)
    hp = _round_up(max(hr, (q_pack + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    p = BR * BL

    src_cm = jnp.transpose(src_rect, (2, 0, 1))
    src_cm = jnp.pad(src_cm, ((0, 0), (0, hp - hr), (0, wp - wr)))
    src_t = _pack_rows(src_cm, g)

    pd = wc.PD if dpl % wc.PD == 0 else (2 if dpl % 2 == 0 else 1)
    pxc = jnp.clip(px, -2.0, float(wp) + 1.0)
    pxc = jnp.pad(pxc, ((0, 0), (0, hp - hr), (0, wp - wr)),
                  constant_values=float(wp) + 1.0)
    px_t = _tile_lanes(pxc, nh, nw)   # (D, nh, nw, P)
    c0 = jnp.clip(
        (jnp.floor(
            jnp.min(px_t.reshape(dpl // pd, pd, nh, nw, p), axis=(1, 4))
        ).astype(jnp.int32) - 1) // BL * BL,
        0, wp - cwin,
    )
    origin = jnp.stack([jnp.zeros_like(c0), c0], axis=-1)

    return pl.pallas_call(
        _make_sweep1d_kernel(c, pd, cwin),
        grid=(dpl // pd, nh, nw),
        in_specs=[
            pl.BlockSpec((1, 1, nw, 2), lambda d, i, j: (d, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((pd, 1, nw, p), lambda d, i, j: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, g * c, p), lambda d, i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pd, 1, 2 * nw, p), lambda d, i, j: (d, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((dpl, nh, 2 * nw, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, q1, g * c, cwin), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(origin, px_t, src_t, ref_t)


def _sweep1d_span_ok(px, hr, wr, c, cwin):
    """Window-width check for the 1-D sweep (rows are exact by design)."""
    g, q_pack = _row_group(c)
    dpl = px.shape[0]
    wp = max(_round_up(wr, BL), wc.C_WIN)
    hp = _round_up(max(hr, (q_pack + 1) * g), max(BR, g))
    nh, nw = hp // BR, wp // BL
    p = BR * BL
    pxc = jnp.pad(jnp.clip(px, -2.0, float(wp) + 1.0),
                  ((0, 0), (0, hp - hr), (0, wp - wr)),
                  constant_values=float(wp) + 1.0)
    pd = wc.PD if dpl % wc.PD == 0 else (2 if dpl % 2 == 0 else 1)
    px_t = _tile_lanes(pxc, nh, nw).reshape(dpl // pd, pd, nh, nw, p)
    c0 = jnp.clip(
        (jnp.floor(jnp.min(px_t, axis=(1, 4))).astype(jnp.int32) - 1)
        // BL * BL, 0, wp - cwin,
    )
    hx = jnp.where(pxc < wr,
                   jnp.minimum(jnp.floor(pxc) + 1.0, float(wr - 1)), -1e9)
    vx = jnp.max(_tile_lanes(hx, nh, nw).reshape(dpl // pd, pd, nh, nw, p),
                 axis=(1, 4))
    return jnp.all(vx - c0.astype(jnp.float32) < cwin)


# ---------------------------------------------------------------------------
# per-view orchestration
# ---------------------------------------------------------------------------

def _fan_coeffs(dv: jnp.ndarray):
    """(D, H, W) hypotheses -> per-pixel 2-parameter fan description.

    Two parameterizations cover every shipped hypothesis fan:

      * uniform in 1/d (the cascade samplers, core/sampling.py): the
        disparity px(d) = px_inf + b*(inv_lo + d*inv_step) is AFFINE in
        the plane index — recovered exactly from the endpoints;
      * uniform in d (the 4-plane refine checkerboards: every stack6
        slice in models/depth_net.py is arithmetic with step mx-mn):
        px(d) = px_inf + b / (lo + d*step).

    Returns (coeffs (H, W, 4) = [inv_lo, inv_step, lo, step],
    inv_ok, dep_ok) where the *_ok booleans verify the respective
    parameterization on the mid plane over ALL pixels."""
    d = dv.shape[0]
    mid = d // 2

    inv = 1.0 / dv
    inv_lo = inv[0]
    inv_step = (inv[-1] - inv[0]) / (d - 1)
    pred = inv_lo + mid * inv_step
    inv_err = jnp.max(
        jnp.abs(pred - inv[mid]) / jnp.maximum(jnp.abs(inv[mid]), 1e-12)
    )

    lo = dv[0]
    step = (dv[-1] - dv[0]) / (d - 1)
    predd = lo + mid * step
    dep_err = jnp.max(
        jnp.abs(predd - dv[mid]) / jnp.maximum(jnp.abs(dv[mid]), 1e-12)
    )

    coeffs = jnp.stack([inv_lo, inv_step, lo, step], axis=-1)
    # refine fans can cross zero depth -> inf in the (unused) inverse
    # channels; sanitize so the coefficient RESAMPLE can't smear NaNs
    # into neighbouring pixels (the *_ok flags are computed above, from
    # the raw values)
    coeffs = jnp.nan_to_num(coeffs, nan=0.0, posinf=0.0, neginf=0.0)
    return coeffs, inv_err < 1e-4, dep_err < 1e-4


def _fan_px(rect, coeffs, inv_mode, dpl: int, h: int, w: int):
    """Per-plane lane coordinates on the rect grid from resampled fan
    coefficients (H, W, 4).  inv_mode selects the affine-in-1/d form
    (exact for cascade fans); otherwise affine-in-d (refine fans), whose
    division is eps-guarded so an invalid fan yields huge-but-finite
    coordinates that fail the span check (-> 2-D fallback) instead of
    poisoning it with NaNs."""
    gx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    gy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    px_inf = rect.px_aff[0] * gx + rect.px_aff[1] * gy + rect.px_aff[2]
    b = rect.b_aff[0] * gx + rect.b_aff[1] * gy + rect.b_aff[2]
    ds = jnp.arange(dpl, dtype=jnp.float32)

    px_inv = (px_inf + b * coeffs[..., 0])[None] \
        + ds[:, None, None] * (b * coeffs[..., 1])[None]

    denom = coeffs[..., 2][None] + ds[:, None, None] * coeffs[..., 3][None]
    safe = jnp.where(jnp.abs(denom) < 1e-9,
                     jnp.where(denom < 0, -1e-9, 1e-9), denom)
    px_dep = px_inf[None] + b[None] / safe

    return jnp.where(inv_mode, px_inv, px_dep)


def _unrect_chunks(dpl: int) -> list[int] | None:
    """Split D*2 folded channels into chunks dividing 128 (greedy 64/32/
    16/8); None when impossible (route to the 2-D kernel instead)."""
    rem, chunks = dpl * 2, []
    for size in (64, 32, 16, 8):
        while rem >= size:
            chunks.append(size)
            rem -= size
    return chunks if rem == 0 else None


def sweep_engaged(
    rel: jnp.ndarray,
    depth_values: jnp.ndarray,
    h: int, w: int, c: int,
    cwin: int = C_WIN_FAST,
) -> bool:
    """Diagnostic: would `epipolar_corr_view` take the 1-D sweep for this
    (view, stage), or fall back to the 2-D kernel?

    Mirrors both validity rounds eagerly (inputs are concrete), with the
    round-2 fan-coefficient resample approximated by a plain jnp bilinear
    sample (numerically within fp rounding of the kernel's).  Used by
    tools/numerics_check.py so an "epipolar matches the default path"
    report can never silently mean "epipolar fell back everywhere"
    (the r3 artifact was ambiguous on exactly this)."""
    from dmvsnet_tpu.ops import warp as warp_ops

    dpl = depth_values.shape[0]
    chunks = _unrect_chunks(dpl)
    g = 128 // c
    if not (chunks is not None and (BR % g == 0 or g % BR == 0)
            and 128 % c == 0
            and h % 2 == 0 and w % 2 == 0 and dpl >= 2):
        return False
    rect = epipolar.compute_rectification(rel, h, w)
    sxx, sxy = epipolar.rect_grid_coords(rect.h_src, h, w)
    rxx, rxy = epipolar.rect_grid_coords(rect.h_ref, h, w)
    ux, uy = epipolar.unrect_grid_coords(rect.h_ref, h, w)
    coeffs0, inv_ok, dep_ok = _fan_coeffs(depth_values)

    diag = float((h * h + w * w) ** 0.5)
    ok = jnp.all((jnp.abs(rect.scales) > SCALE_MIN)
                 & (jnp.abs(rect.scales) < SCALE_MAX))
    ok &= rect.epipole_dist > EPIPOLE_MARGIN * diag
    ok &= inv_ok | dep_ok
    ok &= _resample_span_ok(sxx, sxy, h, w, c, cwin)
    ok &= _resample_span_ok(rxx, rxy, h, w, c, cwin)
    for ch in set(chunks):
        ok &= _resample_span_ok(ux, uy, h, w, ch, cwin)
    if not bool(ok):
        return False

    coeffs = warp_ops.bilinear_sample(coeffs0, rxx, rxy)
    px = _fan_px(rect, coeffs, inv_ok, dpl, h, w)
    return bool(_sweep1d_span_ok(px, h, w, c, cwin))


def epipolar_corr_view(
    src_feat: jnp.ndarray,
    ref_feat: jnp.ndarray,
    ref_t: jnp.ndarray,
    rel: jnp.ndarray,
    depth_values: jnp.ndarray,
    interpret: bool = False,
    cwin: int = C_WIN_FAST,
) -> jnp.ndarray:
    """One source view's correlation volume (D, H, W, 2): the rectified
    1-D sweep when the pair's geometry admits it, the exact 2-D kernel
    otherwise.  Validity is evaluated in two cheap rounds (coordinate
    arithmetic, then one tiny c=2 resample for the fan coefficients)
    before any heavy kernel runs, so the fallback costs ~nothing extra.
    """
    h, w, c = src_feat.shape
    dpl = depth_values.shape[0]
    chunks = _unrect_chunks(dpl)
    rect = epipolar.compute_rectification(rel, h, w)

    sxx, sxy = epipolar.rect_grid_coords(rect.h_src, h, w)
    rxx, rxy = epipolar.rect_grid_coords(rect.h_ref, h, w)
    ux, uy = epipolar.unrect_grid_coords(rect.h_ref, h, w)
    coeffs0, inv_ok, dep_ok = _fan_coeffs(depth_values)

    # round-1 validity: pure coordinate arithmetic
    diag = float((h * h + w * w) ** 0.5)
    ok = jnp.all((jnp.abs(rect.scales) > SCALE_MIN)
                 & (jnp.abs(rect.scales) < SCALE_MAX))
    ok &= rect.epipole_dist > EPIPOLE_MARGIN * diag
    ok &= inv_ok | dep_ok
    ok &= _resample_span_ok(sxx, sxy, h, w, c, cwin)
    ok &= _resample_span_ok(rxx, rxy, h, w, c, cwin)
    for ch in set(chunks or ()):
        ok &= _resample_span_ok(ux, uy, h, w, ch, cwin)

    def exact_2d():
        return _untile_out(
            wc._corr_view_tiled_safe(
                interpret, src_feat, ref_feat, ref_t, rel, depth_values
            ), h, w,
        )

    def try_sweep():
        # round-2 validity: the per-plane lane coordinates (needs the fan
        # coefficients on the rect grid — one tiny c=4 resample)
        coeffs = resample_tiled(coeffs0, rxx, rxy, cwin, interpret)
        px = _fan_px(rect, coeffs, inv_ok, dpl, h, w)
        ok2 = _sweep1d_span_ok(px, h, w, c, cwin)

        def sweep():
            perm = list(range(0, c, 2)) + list(range(1, c, 2))
            src_r = resample_tiled(src_feat[:, :, jnp.array(perm)],
                                   sxx, sxy, cwin, interpret)
            ref_r = resample_tiled(ref_feat, rxx, rxy, cwin, interpret)
            refr_t = _tile_ref(ref_r)
            # src_r channels are ALREADY group-major; _sweep1d packs as-is
            corr_t = _sweep1d(src_r, refr_t, px, cwin, interpret)
            corr_r = _untile_out(corr_t, h, w)
            vol = jnp.moveaxis(corr_r, 0, 2).reshape(h, w, dpl * 2)
            outs, start = [], 0
            for chunk in chunks:
                outs.append(resample_tiled(
                    vol[..., start:start + chunk], ux, uy, cwin, interpret))
                start += chunk
            out = jnp.concatenate(outs, axis=-1).reshape(h, w, dpl, 2)
            return jnp.moveaxis(out, 2, 0)

        return jax.lax.cond(ok2, sweep, exact_2d)

    g = 128 // c
    # static support: chunks must tile the folded unrect channels, the
    # row-group must nest with the tile height (either direction — g > BR
    # uses the offset row mask), and the fan needs >= 2 planes to fit a
    # 2-parameter form.  The 4-plane refine passes qualify via the
    # depth-affine mode; stage 3 (c=8, g=16) via the g > BR packing.
    supported = (
        chunks is not None and (BR % g == 0 or g % BR == 0) and 128 % c == 0
        and h % 2 == 0 and w % 2 == 0 and dpl >= 2
    )
    if not supported:
        return exact_2d()
    return jax.lax.cond(ok, try_sweep, exact_2d)


def aggregate_cost_volume_epipolar(
    features: list[jnp.ndarray],
    proj2: jnp.ndarray,
    depth_values: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for aggregate_cost_volume_pallas using the rectified 1-D
    sweep where valid, the exact 2-D kernel where not (per view).

    Eval-time only: no custom VJP on this path (training keeps the 2-D
    kernel, whose adjoints are hand-written and parity-tested).
    """
    if interpret is None:
        interpret = INTERPRET
    b = features[0].shape[0]
    h, w = features[0].shape[1:3]
    # fp32 kernel contract (same as warp_correlate): the sweep / resample
    # kernels and their DMA scratch are fp32-typed; upcast bf16 callers
    features = [f.astype(jnp.float32) for f in features]
    depth_values = depth_values.astype(jnp.float32)
    if depth_values.ndim == 2:
        depth_values = jnp.broadcast_to(
            depth_values[:, :, None, None], (b, depth_values.shape[1], h, w)
        )
    fused = geometry.fuse_projection(proj2)

    outs = []
    for bi in range(b):
        ref = features[0][bi]
        ref_t = _tile_ref(ref)
        total = None
        for v in range(1, len(features)):
            rel = geometry.relative_projection(fused[bi, v], fused[bi, 0])
            corr = epipolar_corr_view(
                features[v][bi], ref, ref_t, rel, depth_values[bi], interpret
            )
            total = corr if total is None else total + corr
        outs.append(total)
    return jnp.stack(outs)
