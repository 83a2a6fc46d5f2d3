"""H.264 inter prediction (quarter-pel MC) as Pallas TPU kernels.

XLA's gather costs ~12 ns per ELEMENT on a v5e regardless of index
structure (measured), which makes the per-block patch gather in
device_recon._mc ~85 ms/frame at 1080p. This module replaces it with
scalar-prefetched window DMA: the reference's half-pel FIR planes are
kept in HBM as OVERLAPPING 32x256 tiles (stride 16x128, so any 16x16
source patch with taps is contained in exactly one tile), and a Pallas
grid fetches per-macroblock windows through BlockSpec index_maps driven
by prefetched selector scalars -- the pipeline double-buffers the DMAs,
and the kernel only rolls each window by its residual offset (dynamic
rolls are supported by Mosaic) and does the two-tap average / bilinear
math at static coordinates.

Two tiers, chained through aliased outputs:
* tier A: macroblocks whose 16 blocks share one MV + ref (and whose
  per-block clipped source coords are consistent -- checked exactly on
  the host): one luma window per tap + one chroma window per plane,
  one grid step per MB. ~99% of inter MBs in normal streams.
* tier B: everything else at per-4x4-block granularity (16 grid steps
  per MB, same windows). No XLA gather fallback remains.

Host-side selector math mirrors device_recon._mc / recon.mc_*_blocks
bit-for-bit (incl. the PAD-clip); bit-exactness vs the XLA gather path
is asserted in tests/test_h264_device.py.

Behavioral reference: /root/reference/libavcodec/h264_mb.c +
h264qpel_template.c (reimplemented)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from librempeg_tpu.codecs.h264 import device_recon as DR

PAD = DR.PAD            # 32 (luma), matches recon.py
PADC = DR.PADC          # 16


def _align_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# overlapping tiling of the reference planes (once per DPB insertion)
# ---------------------------------------------------------------------------

def _tile_plane(p):
    """[h, w] (h % 16 == 0, w % 128 == 0) -> [h/16-1, w/128-1, 32, 256]
    overlapping tiles: tile (ty, tx) = p[ty*16 : ty*16+32,
    tx*128 : tx*128+256]."""
    h, w = p.shape
    nty, ntx = h // 16 - 1, w // 128 - 1
    a = p.reshape(h // 16, 16, w)
    rows = jnp.concatenate([a[:-1], a[1:]], axis=1)       # [nty, 32, w]
    b = rows.reshape(nty, 32, w // 128, 128)
    tiles = jnp.concatenate([b[:, :, :-1], b[:, :, 1:]], axis=3)
    return tiles.transpose(0, 2, 1, 3)        # [nty, ntx, 32, 256]


@jax.jit
def tile_refpack(luma4, upad, vpad):
    """Tile one DPB entry's MC planes. luma4 [4, hp, wp] uint8 (E/b/h/j
    padded by PAD), upad/vpad [hc, wc]. Returns (lt [4, nty, ntx, 32,
    256], ct [2, ncty, nctx, 32, 256])."""
    hp, wp = luma4.shape[1], luma4.shape[2]
    lp = jnp.pad(luma4, ((0, 0), (0, _align_up(hp, 16) + 16 - hp),
                         (0, _align_up(wp, 128) + 128 - wp)))
    lt = jax.vmap(_tile_plane)(lp)
    hc, wc = upad.shape
    cpadded = jnp.pad(jnp.stack([upad, vpad]),
                      ((0, 0), (0, _align_up(hc, 16) + 16 - hc),
                       (0, _align_up(wc, 128) + 128 - wc)))
    ct = jax.vmap(_tile_plane)(cpadded)
    return lt, ct


# ---------------------------------------------------------------------------
# host-side selector computation (numpy, mirrors recon.mc_*_blocks)
# ---------------------------------------------------------------------------

def build_selectors(res: dict, mb_w: int, mb_h: int, hp: int, wp: int,
                    hc: int, wc: int):
    """Per-MB window selectors for the Pallas MC kernels.

    hp/wp: luma refpack plane dims (with PAD); hc/wc: chroma pack dims.
    Returns (selA [nmb, 6] int32 -- tier-A rows padded with dummy
    slots; selB [k, 6] int32 per 4x4 block of non-tier-A inter MBs).
    Packing per row: [wA, wB, wC, rollL, rollCW, slot]."""
    kind = res["kind"]
    mv = res["mv"]
    ref = res["ref"]
    nmb = mb_w * mb_h
    inter = (kind == 0) | (kind == 1)

    bidx = np.arange(16)
    mby = np.arange(nmb, dtype=np.int32) // mb_w
    mbx = np.arange(nmb, dtype=np.int32) % mb_w
    y0 = mby * 16
    x0 = mbx * 16
    mvx0 = mv[:, 0, 0].astype(np.int32)
    mvy0 = mv[:, 0, 1].astype(np.int32)
    r0 = np.maximum(ref[:, 0].astype(np.int32), 0)

    # cheap uniformity pre-check on the raw arrays
    mveq = (mv == mv[:, :1, :]).all(axis=(1, 2))
    refeq = (ref == ref[:, :1]).all(axis=1)

    def luma_clip(y, x):
        return (np.clip(y + PAD, 3, hp - 8),
                np.clip(x + PAD, 3, wp - 8))

    def chroma_clip(y, x):
        return (np.clip(y + PADC, 0, hc - 4),
                np.clip(x + PADC, 0, wc - 4))

    # corner-block clip consistency: clip is monotone/identity inside
    # the linear region, so corners (blocks 0 and 15) matching the
    # uniform pattern implies all 16 blocks match
    iy0, ix0 = luma_clip(y0 + (mvy0 >> 2), x0 + (mvx0 >> 2))
    iy15, ix15 = luma_clip(y0 + 12 + (mvy0 >> 2), x0 + 12 + (mvx0 >> 2))
    cy0, cx0 = chroma_clip(y0 // 2 + (mvy0 >> 3), x0 // 2 + (mvx0 >> 3))
    cy15, cx15 = chroma_clip(y0 // 2 + 6 + (mvy0 >> 3),
                             x0 // 2 + 6 + (mvx0 >> 3))
    uni = (inter & mveq & refeq
           & (iy15 == iy0 + 12) & (ix15 == ix0 + 12)
           & (cy15 == cy0 + 6) & (cx15 == cx0 + 6))

    qm = DR._QM                                          # [16, 6] np
    key = (mvy0 & 3) * 4 + (mvx0 & 3)                    # per MB
    q = qm[key]                                          # [nmb, 6]

    def pack_w(p, sy, sx):
        ty, ry = sy >> 4, sy & 15
        tx, rx = sx >> 7, sx & 127
        return (p << 16) | (ty << 8) | tx, ry, rx

    syA = iy0 + q[:, 1]
    sxA = ix0 + q[:, 2]
    syB = iy0 + q[:, 4]
    sxB = ix0 + q[:, 5]
    wA, ryA, rxA = pack_w(r0 * 4 + q[:, 0], syA, sxA)
    wB, ryB, rxB = pack_w(r0 * 4 + q[:, 3], syB, sxB)
    wC, ryC, rxC = pack_w(r0 * 2, cy0, cx0)
    dxw = mvx0 & 7
    dyw = mvy0 & 7
    rollL = (ryA << 24) | (rxA << 16) | (ryB << 8) | rxB
    rollCW = (ryC << 24) | (rxC << 16) | (dxw << 8) | dyw

    selA = np.zeros((nmb, 6), np.int32)
    selA[:, 0] = wA
    selA[:, 1] = wB
    selA[:, 2] = wC
    selA[:, 3] = rollL
    selA[:, 4] = rollCW
    selA[:, 5] = np.where(uni, np.arange(nmb), nmb)      # dummy = nmb

    # ---- tier B: per-4x4 for the rest (small subset) ----
    rest = np.flatnonzero(inter & ~uni)
    if rest.size:
        mvb = mv[rest].astype(np.int32)                  # [k, 16, 2]
        mvxb = mvb[:, :, 0]
        mvyb = mvb[:, :, 1]
        ridb = np.maximum(ref[rest].astype(np.int32), 0)[
            :, ((bidx // 4) // 2) * 2 + (bidx % 4) // 2]  # [k, 16]
        ys = (y0[rest][:, None] + (bidx // 4)[None, :] * 4)
        xs = (x0[rest][:, None] + (bidx % 4)[None, :] * 4)
        iyb, ixb = luma_clip(ys + (mvyb >> 2), xs + (mvxb >> 2))
        cyb, cxb = chroma_clip(ys // 2 + (mvyb >> 3),
                               xs // 2 + (mvxb >> 3))
        keyb = (mvyb & 3) * 4 + (mvxb & 3)
        qb = qm[keyb]                                    # [k, 16, 6]
        syA = iyb + qb[..., 1]
        sxA = ixb + qb[..., 2]
        syB = iyb + qb[..., 4]
        sxB = ixb + qb[..., 5]
        wA, ryA, rxA = pack_w(ridb * 4 + qb[..., 0], syA, sxA)
        wB, ryB, rxB = pack_w(ridb * 4 + qb[..., 3], syB, sxB)
        wC, ryC, rxC = pack_w(ridb * 2, cyb, cxb)
        dxw = mvxb & 7
        dyw = mvyb & 7
        m = rest[:, None]
        b = bidx[None, :]
        selB = np.zeros((rest.size * 16, 6), np.int32)
        selB[:, 0] = wA.ravel()
        selB[:, 1] = wB.ravel()
        selB[:, 2] = wC.ravel()
        selB[:, 3] = ((ryA << 24) | (rxA << 16) | (ryB << 8)
                      | rxB).ravel()
        selB[:, 4] = ((ryC << 24) | (rxC << 16) | (dxw << 8)
                      | dyw).ravel()
        # slot: mb*16 + block-row*4 + block-col
        selB[:, 5] = (m * 16 + (b // 4) * 4 + (b % 4)).ravel()
    else:
        selB = np.zeros((0, 6), np.int32)
    return selA, selB


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

_GA = 8                               # tier-A MBs per grid step


def _mc_mb_group_kernel(s_ref, *refs):
    """Tier A: a group of _GA raster-consecutive macroblocks per step.

    MC has no cross-MB dependency, so the only reason for grid steps is
    the scalar-prefetched window DMA; grouping 8 MBs per step cuts the
    sequential step count 8x (the dominant cost at 1080p: ~8k steps ->
    ~1k) while the per-MB math is unchanged. Outputs are written as one
    [_GA, 16, 16] raster-order block per step (garbage for non-tier-A
    MBs; tier B and the intra scan overwrite those slots afterwards)."""
    wins = refs[:4 * _GA]
    pyo, puo, pvo = refs[4 * _GA:4 * _GA + 3]
    i = pl.program_id(0)
    for g in range(_GA):
        wa, wb, wu, wv = wins[4 * g:4 * g + 4]
        rl = s_ref[(i * _GA + g) * 6 + 3]
        rc = s_ref[(i * _GA + g) * 6 + 4]
        a = wa[0, 0, 0].astype(jnp.int32)
        a = pltpu.roll(pltpu.roll(a, -((rl >> 24) & 255), 0),
                       -((rl >> 16) & 255), 1)
        b = wb[0, 0, 0].astype(jnp.int32)
        b = pltpu.roll(pltpu.roll(b, -((rl >> 8) & 255), 0),
                       -(rl & 255), 1)
        pyo[g] = ((a[0:16, 0:16] + b[0:16, 0:16] + 1) >> 1) \
            .astype(pyo.dtype)

        ryc = (rc >> 24) & 255
        rxc = (rc >> 16) & 255
        dx = (rc >> 8) & 255
        dy = rc & 255
        for cref, cout in ((wu, puo), (wv, pvo)):
            c = cref[0, 0, 0].astype(jnp.int32)
            c = pltpu.roll(pltpu.roll(c, -ryc, 0), -rxc, 1)
            p00 = c[0:8, 0:8]
            p01 = c[0:8, 1:9]
            p10 = c[1:9, 0:8]
            p11 = c[1:9, 1:9]
            pred = ((8 - dx) * (8 - dy) * p00 + dx * (8 - dy) * p01
                    + (8 - dx) * dy * p10 + dx * dy * p11 + 32) >> 6
            cout[g] = pred.astype(cout.dtype)


def _place_mask(n, r0, r1, c0, c1):
    """[n, n] bool mask of the [r0:r1, c0:c1] rectangle, built from
    iotas in-kernel (captured array constants are not allowed)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    m1 = jnp.broadcast_to((ri >= r0) & (ri < r1), (n, n))
    m2 = jnp.broadcast_to((ci >= c0) & (ci < c1), (n, n))
    return m1 & m2


def _mc_mb16_kernel(s_ref, refs, pyo, puo, pvo):
    """Tier B: one NON-uniform macroblock per step; refs = 64 window
    refs (16 x wA, 16 x wB, 16 x wU, 16 x wV). Each 4x4 block computes
    from its own windows and is placed at its static MB position; the
    whole [16, 16] block is written once (no read-merge)."""
    i = pl.program_id(0)
    yacc = jnp.zeros((16, 16), jnp.int32)
    uacc = jnp.zeros((8, 8), jnp.int32)
    vacc = jnp.zeros((8, 8), jnp.int32)
    for k in range(16):
        br, bc = k // 4, k % 4
        rl = s_ref[(i * 16 + k) * 6 + 3]
        rc = s_ref[(i * 16 + k) * 6 + 4]
        a = refs[k][0, 0, 0].astype(jnp.int32)
        a = pltpu.roll(pltpu.roll(a, -((rl >> 24) & 255), 0),
                       -((rl >> 16) & 255), 1)
        b = refs[16 + k][0, 0, 0].astype(jnp.int32)
        b = pltpu.roll(pltpu.roll(b, -((rl >> 8) & 255), 0),
                       -(rl & 255), 1)
        p16 = (a[0:16, 0:16] + b[0:16, 0:16] + 1) >> 1
        p16 = pltpu.roll(pltpu.roll(p16, br * 4, 0), bc * 4, 1)
        yacc = jnp.where(_place_mask(16, br * 4, br * 4 + 4,
                                     bc * 4, bc * 4 + 4), p16, yacc)

        ryc = (rc >> 24) & 255
        rxc = (rc >> 16) & 255
        dx = (rc >> 8) & 255
        dy = rc & 255
        for ci, acc in ((32 + k, 0), (48 + k, 1)):
            c = refs[ci][0, 0, 0].astype(jnp.int32)
            c = pltpu.roll(pltpu.roll(c, -ryc, 0), -rxc, 1)
            p00 = c[0:8, 0:8]
            p01 = c[0:8, 1:9]
            p10 = c[1:9, 0:8]
            p11 = c[1:9, 1:9]
            pred = ((8 - dx) * (8 - dy) * p00 + dx * (8 - dy) * p01
                    + (8 - dx) * dy * p10 + dx * dy * p11 + 32) >> 6
            pred = pltpu.roll(pltpu.roll(pred, br * 2, 0), bc * 2, 1)
            cmask = _place_mask(8, br * 2, br * 2 + 2, bc * 2,
                                bc * 2 + 2)
            if acc == 0:
                uacc = jnp.where(cmask, pred, uacc)
            else:
                vacc = jnp.where(cmask, pred, vacc)
    pyo[0] = yacc.astype(pyo.dtype)
    puo[0] = uacc.astype(puo.dtype)
    pvo[0] = vacc.astype(pvo.dtype)


def _win_spec_g(col, g, vplane=False):
    """Luma/chroma window BlockSpec for group member g, picking tile
    (p, ty, tx) from the packed selector column (chroma V plane: same
    tile coords, next plane index)."""
    def imap(i, s):
        w = s[(i * _GA + g) * 6 + col]
        return ((w >> 16) + (1 if vplane else 0),
                (w >> 8) & 255, w & 255, 0, 0)

    return pl.BlockSpec((1, 1, 1, 32, 256), imap)


@functools.partial(jax.jit, static_argnames=("nmb", "nb", "interpret"))
def mc_predict(lt, ct, selA, selB, nmb: int, nb: int,
               interpret: bool = False):
    """lt [R*4, nty, ntx, 32, 256] uint8, ct [R*2, ...]: tiled DPB.
    selA [nmb, 6]; selB [nb*16, 6] (16 consecutive rows per tier-B MB,
    nb = tier-B MB count; pad MBs use slot nmb<<4 with valid windows).
    Returns (pred_y [nmb, 16, 16], pred_u/v [nmb, 8, 8]) uint8."""
    nga = (nmb + _GA - 1) // _GA
    npad = nga * _GA
    nslots = max(npad, nmb + 1)
    if npad > nmb:
        # zero-packed pad rows select valid window (0, 0, 0), roll 0
        selA = jnp.concatenate(
            [selA, jnp.zeros((npad - nmb, 6), selA.dtype)])
    selA = selA.reshape(-1)
    selB = selB.reshape(-1)
    shapes = [jax.ShapeDtypeStruct((nslots, 16, 16), jnp.uint8),
              jax.ShapeDtypeStruct((nslots, 8, 8), jnp.uint8),
              jax.ShapeDtypeStruct((nslots, 8, 8), jnp.uint8)]

    wspecsA = []
    srcsA = []
    for g in range(_GA):
        wspecsA += [_win_spec_g(0, g), _win_spec_g(1, g),
                    _win_spec_g(2, g), _win_spec_g(2, g, vplane=True)]
        srcsA += [lt, lt, ct, ct]
    gsA = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nga,),
        in_specs=wspecsA,
        out_specs=[
            pl.BlockSpec((_GA, 16, 16), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((_GA, 8, 8), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((_GA, 8, 8), lambda i, s: (i, 0, 0))])

    py, pu, pv = pl.pallas_call(
        _mc_mb_group_kernel, grid_spec=gsA, out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(selA, *srcsA)

    if nb:
        def win_b(col, k, vplane=False):
            def imap(i, s):
                w = s[(i * 16 + k) * 6 + col]
                return ((w >> 16) + (1 if vplane else 0),
                        (w >> 8) & 255, w & 255, 0, 0)

            return pl.BlockSpec((1, 1, 1, 32, 256), imap)

        def slot_mb(i, s):
            return (s[i * 16 * 6 + 5] >> 4, 0, 0)

        wspecs = ([win_b(0, k) for k in range(16)]
                  + [win_b(1, k) for k in range(16)]
                  + [win_b(2, k) for k in range(16)]
                  + [win_b(2, k, vplane=True) for k in range(16)])
        gsB = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=wspecs
            + [pl.BlockSpec((1, 16, 16), slot_mb),
               pl.BlockSpec((1, 8, 8), slot_mb),
               pl.BlockSpec((1, 8, 8), slot_mb)],
            out_specs=[pl.BlockSpec((1, 16, 16), slot_mb),
                       pl.BlockSpec((1, 8, 8), slot_mb),
                       pl.BlockSpec((1, 8, 8), slot_mb)])

        def kernB(s_ref, *refs):
            _mc_mb16_kernel(s_ref, refs[:64], *refs[67:70])

        srcs = ([lt] * 16 + [lt] * 16 + [ct] * 16 + [ct] * 16)
        py, pu, pv = pl.pallas_call(
            kernB, grid_spec=gsB, out_shape=shapes,
            input_output_aliases={65: 0, 66: 1, 67: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(selB, *srcs, py, pu, pv)

    return py[:nmb], pu[:nmb], pv[:nmb]
