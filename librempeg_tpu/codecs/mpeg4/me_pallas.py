"""MPEG-4 half-pel refinement + motion compensation as Pallas kernels.

The XLA-gather forms in ops/motion.py (_hpel_refine window gather,
mc_hpel chroma gather) cost ~12 ns/element on a v5e regardless of index
structure — 14.7 ms + 2x5.3 ms per 720p frame, the dominant cost of the
MPEG-4 encoder's device pass. This module replaces them with the
windowed-DMA pattern proven in codecs/h264/mc_pallas.py: reference
planes live in HBM as OVERLAPPING tiles (any window the search can
request is contained in exactly one tile), and a Pallas grid DMAs one
tile per macroblock through BlockSpec index_maps driven by prefetched
selector scalars, rolls by the residual offset, and evaluates the 25
half-pel candidates (decoder-exact integer interpolation) entirely in
VMEM.

Bit-exactness contract: identical (mv, pred) to ops.motion._hpel_refine
+ ops.motion.mc_hpel for the same inputs — same candidate order, same
strict-< tie-breaking, same ((a+b+1-rnd)>>1 / (sum+2-rnd)>>2) integer
rules (reference behavior: /root/reference/libavcodec/hpeldsp.c put/avg
pixel ops; asserted in tests/test_mpeg4_pallas.py).

Layout notes:
* luma tiles are [48, 256] at stride (16, 128): a refine window needs
  19 rows (16 block + 2 refine radius + 1 interp tap) starting at any
  residual row 0..15 -> max extent 34 <= 48.
* chroma tiles are [32, 256] at stride (16, 128): MC windows are 9
  rows -> max extent 24 <= 32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 16          # edge padding added around each plane before tiling


def _align_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_plane(p, rows: int):
    """[h, w] -> [nty, ntx, rows, 256] overlapping tiles at stride
    (16, 128): tile (ty, tx) = p[ty*16 : ty*16+rows, tx*128 :
    tx*128+256]. h % 16 == 0, w % 128 == 0 required."""
    h, w = p.shape
    k = rows // 16
    nty = h // 16 - k
    a = p.reshape(h // 16, 16, w)
    # k consecutive 16-row groups per tile row
    r = jnp.concatenate([a[i:nty + i] for i in range(k)], axis=1)
    b = r.reshape(nty, rows, w // 128, 128)
    tiles = jnp.concatenate([b[:, :, :-1], b[:, :, 1:]], axis=3)
    return tiles.transpose(0, 2, 1, 3)      # [nty, ntx-1, rows, 256]


def _prep_plane(p, rows: int):
    """Pad a [H, W] integer-valued plane with `PAD` edge pixels, align
    for tiling, and tile. Returns uint8 tiles."""
    q = jnp.pad(p.astype(jnp.uint8), ((PAD, PAD), (PAD, PAD)),
                mode="edge")
    h, w = q.shape
    h2 = _align_up(h, 16) + rows          # slack so every ty exists
    w2 = _align_up(w, 128) + 128          # slack so every tx exists
    q = jnp.pad(q, ((0, h2 - h), (0, w2 - w)))
    return _tile_plane(q, rows)


# ---------------------------------------------------------------------------
# luma: fused half-pel refinement + MC
# ---------------------------------------------------------------------------


def _refine_kernel(s_ref, win, cur, pred_o, mv_o, *, rnd: int):
    """One macroblock per grid step: evaluate the 25 half-pel
    candidates around the integer winner on a rolled [48, 256] window,
    pick the best (strict <, row-major candidate order — identical to
    ops.motion._hpel_refine), write the winning 16x16 prediction and
    the half-pel MV."""
    i = pl.program_id(0)
    rr = s_ref[i * 4 + 1]
    w = win[0, 0].astype(jnp.int32)
    # positive complement shifts: pltpu.roll miscompiles negative
    # dynamic shift amounts on hardware (verified v5e; interpret is
    # fine), so roll by (size - k) instead of -k.
    w = pltpu.roll(pltpu.roll(w, (48 - ((rr >> 8) & 255)) % 48, 0),
                   (256 - (rr & 255)) & 255, 1)
    c = cur[0, 0].astype(jnp.int32)
    r1 = 1 - rnd
    r2 = 2 - rnd

    best_cost = jnp.int32(2 ** 31 - 1)
    best_pred = jnp.zeros((16, 16), jnp.int32)
    best_dy = jnp.int32(0)
    best_dx = jnp.int32(0)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            r0 = 1 + (dy >> 1)
            c0 = 1 + (dx >> 1)
            fy, fx = dy & 1, dx & 1
            a = w[r0:r0 + 16, c0:c0 + 16]
            if fy == 0 and fx == 0:
                p = a
            elif fy == 0:
                p = (a + w[r0:r0 + 16, c0 + 1:c0 + 17] + r1) >> 1
            elif fx == 0:
                p = (a + w[r0 + 1:r0 + 17, c0:c0 + 16] + r1) >> 1
            else:
                p = (a + w[r0:r0 + 16, c0 + 1:c0 + 17]
                     + w[r0 + 1:r0 + 17, c0:c0 + 16]
                     + w[r0 + 1:r0 + 17, c0 + 1:c0 + 17] + r2) >> 2
            sad = jnp.sum(jnp.abs(c - p))
            take = sad < best_cost
            best_cost = jnp.where(take, sad, best_cost)
            best_pred = jnp.where(take, p, best_pred)
            best_dy = jnp.where(take, jnp.int32(dy), best_dy)
            best_dx = jnp.where(take, jnp.int32(dx), best_dx)
    pred_o[0, 0] = best_pred.astype(jnp.uint8)
    mvy = 2 * s_ref[i * 4 + 2] + best_dy
    mvx = 2 * s_ref[i * 4 + 3] + best_dx
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    mv_o[...] = jnp.where(lane == 0, mvy,
                          jnp.where(lane == 1, mvx, best_cost))


@functools.partial(jax.jit, static_argnames=("bh", "bw", "rnd",
                                             "interpret"))
def _refine_mc_luma(tiles, selev, cur_b, bh: int, bw: int, rnd: int,
                    interpret: bool = False):
    nmb = bh * bw
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nmb,),
        in_specs=[
            pl.BlockSpec((1, 1, 48, 256),
                         lambda i, s: (s[i * 4] >> 16, s[i * 4] & 0xFFFF,
                                       0, 0)),
            pl.BlockSpec((1, 1, 16, 16),
                         lambda i, s: (i // bw, i % bw, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 16, 16),
                         lambda i, s: (i // bw, i % bw, 0, 0)),
            # (nmb, 1, 128): last-two block dims must equal the array's
            # (TPU tiling) — a (1, 128) 2-dim block is rejected.
            pl.BlockSpec((1, 1, 128), lambda i, s: (i, 0, 0)),
        ])
    pred, mv = pl.pallas_call(
        functools.partial(_refine_kernel, rnd=rnd),
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((bh, bw, 16, 16), jnp.uint8),
                   jax.ShapeDtypeStruct((nmb, 1, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(selev, tiles, cur_b)
    return pred, mv


# ---------------------------------------------------------------------------
# luma, lane-packed group form: 8 MBs per grid step
# ---------------------------------------------------------------------------

_G = 8                      # MBs per grid step, one per 32-lane segment


def _refine_group_kernel(s_ref, *refs, rnd: int):
    """8 macroblocks per grid step, LANE-PACKED: each MB's rolled
    search window occupies one 32-lane segment of a [32, 256] tile, so
    every candidate's interpolation/SAD runs once on full-width vectors
    instead of 8 times on [16, 16] tiles (the [1, 16]-lane ops of the
    per-MB kernel waste 7/8 of the VPU). Candidate order and strict-<
    tie-breaking are unchanged -> bit-identical results."""
    wins = refs[:_G]
    cur, pred_o, mv_o = refs[_G], refs[_G + 1], refs[_G + 2]
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    seg = lane % 32                        # lane within the segment

    # stack the 8 rolled windows into one [32, 256] tile
    acc = jnp.zeros((32, 256), jnp.int32)
    for g in range(_G):
        rr = s_ref[(i * _G + g) * 4 + 1]
        w = wins[g][0, 0].astype(jnp.int32)
        # positive complement shifts (negative dynamic rolls miscompile
        # on hardware; see _refine_kernel)
        w = pltpu.roll(w, (48 - ((rr >> 8) & 255)) % 48, 0)[0:32, :]
        w = pltpu.roll(w, (256 - (rr & 255)) & 255, 1)
        w = jnp.where(lane < 32, w, 0)
        if g:
            w = pltpu.roll(w, 32 * g, 1)
        acc = acc + w
    # lane-rolled copies: R[k] segment column j = window column j + k
    R = [acc]
    for k in (1, 2, 3):
        R.append(pltpu.roll(acc, 256 - k, 1))

    c = cur[0].astype(jnp.int32)           # [16, 256] packed cur MBs
    valid = seg < 16
    r1 = 1 - rnd
    r2 = 2 - rnd

    preds = []
    srows = []
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            r0 = 1 + (dy >> 1)
            c0 = 1 + (dx >> 1)
            fy, fx = dy & 1, dx & 1
            a = R[c0][r0:r0 + 16, :]
            if fy == 0 and fx == 0:
                p = a
            elif fy == 0:
                p = (a + R[c0 + 1][r0:r0 + 16, :] + r1) >> 1
            elif fx == 0:
                p = (a + R[c0][r0 + 1:r0 + 17, :] + r1) >> 1
            else:
                p = (a + R[c0 + 1][r0:r0 + 16, :]
                     + R[c0][r0 + 1:r0 + 17, :]
                     + R[c0 + 1][r0 + 1:r0 + 17, :] + r2) >> 2
            d = jnp.where(valid, jnp.abs(c - p), 0)
            preds.append(p)
            srows.append(jnp.sum(d, axis=0, keepdims=True))

    # one group-reduce + broadcast for ALL 25 candidates at once
    S = jnp.concatenate(srows + [jnp.zeros((32 - len(srows), 256),
                                           jnp.int32)], axis=0)
    for sh in (1, 2, 4, 8, 16):            # lane i = sum lanes i..i+31
        S = S + pltpu.roll(S, 256 - sh, 1)
    S = jnp.where(seg == 0, S, 0)
    for sh in (1, 2, 4, 8, 16):            # splat segment head down
        S = S + pltpu.roll(S, sh, 1)

    big = jnp.int32(2 ** 31 - 1)
    best_cost = jnp.full((1, 256), big, jnp.int32)
    best_pred = jnp.zeros((16, 256), jnp.int32)
    best_dy = jnp.zeros((1, 256), jnp.int32)
    best_dx = jnp.zeros((1, 256), jnp.int32)
    k = 0
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            sk = S[k:k + 1, :]
            take = sk < best_cost
            best_cost = jnp.where(take, sk, best_cost)
            best_pred = jnp.where(take, preds[k], best_pred)
            best_dy = jnp.where(take, jnp.int32(dy), best_dy)
            best_dx = jnp.where(take, jnp.int32(dx), best_dx)
            k += 1
    pred_o[0] = best_pred.astype(pred_o.dtype)
    mv_o[0] = jnp.concatenate(
        [best_dy, best_dx, best_cost,
         jnp.zeros((5, 256), jnp.int32)], axis=0)


@functools.partial(jax.jit, static_argnames=("bh", "bw", "rnd",
                                             "interpret"))
def _refine_mc_luma_group(tiles, selev, cur_b, bh: int, bw: int,
                          rnd: int, interpret: bool = False):
    """Group form of _refine_mc_luma: returns (pred [bh,bw,16,16] u8,
    ddy [nmb], ddx [nmb] half-pel deltas)."""
    nmb = bh * bw
    ng = (nmb + _G - 1) // _G
    npad = ng * _G
    if npad > nmb:
        selev = jnp.concatenate(
            [selev, jnp.zeros(4 * (npad - nmb), selev.dtype)])
    # pack cur MBs: group gi lanes 32g..32g+15 = MB 8*gi+g
    curf = cur_b.reshape(nmb, 16, 16)
    curf = jnp.concatenate(
        [curf, jnp.zeros((npad - nmb, 16, 16), curf.dtype)])
    curp = jnp.pad(curf, ((0, 0), (0, 0), (0, 16)))     # [npad,16,32]
    curp = curp.reshape(ng, _G, 16, 32).transpose(0, 2, 1, 3) \
        .reshape(ng, 16, 256)

    wspecs = []
    for g in range(_G):
        wspecs.append(pl.BlockSpec(
            (1, 1, 48, 256),
            functools.partial(
                lambda i, s, g=0: (s[(i * _G + g) * 4] >> 16,
                                   s[(i * _G + g) * 4] & 0xFFFF, 0, 0),
                g=g)))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ng,),
        in_specs=wspecs + [pl.BlockSpec((1, 16, 256),
                                        lambda i, s: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 16, 256), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, 8, 256), lambda i, s: (i, 0, 0)),
        ])
    pred, mv = pl.pallas_call(
        functools.partial(_refine_group_kernel, rnd=rnd),
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((ng, 16, 256), jnp.uint8),
                   jax.ShapeDtypeStruct((ng, 8, 256), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(selev, *([tiles] * _G), curp)
    # unpack: [ng,16,256] -> [npad,16,16] -> [bh,bw,16,16]
    pb = pred.reshape(ng, 16, _G, 32)[:, :, :, :16] \
        .transpose(0, 2, 1, 3).reshape(npad, 16, 16)[:nmb] \
        .reshape(bh, bw, 16, 16)
    ddy = mv[:, 0, ::32].reshape(-1)[:nmb]
    ddx = mv[:, 1, ::32].reshape(-1)[:nmb]
    return pb, ddy, ddx


# ---------------------------------------------------------------------------
# chroma: half-pel MC at derived MVs
# ---------------------------------------------------------------------------


def _chroma_kernel(s_ref, wu, wv, pu_o, pv_o, *, rnd: int):
    i = pl.program_id(0)
    rr = s_ref[i * 2 + 1]
    ry = (rr >> 24) & 255
    rx = (rr >> 16) & 255
    fy = (rr >> 8) & 1
    fx = rr & 1
    r1 = 1 - rnd
    r2 = 2 - rnd
    for win, out in ((wu, pu_o), (wv, pv_o)):
        w = win[0, 0, 0].astype(jnp.int32)
        w = pltpu.roll(pltpu.roll(w, (32 - ry) & 31, 0),
                       (256 - rx) & 255, 1)
        a = w[0:8, 0:8]
        b = w[0:8, 1:9]
        c = w[1:9, 0:8]
        d = w[1:9, 1:9]
        p_h = (a + b + r1) >> 1
        p_v = (a + c + r1) >> 1
        p_hv = (a + b + c + d + r2) >> 2
        p = jnp.where(fy == 0, jnp.where(fx == 0, a, p_h),
                      jnp.where(fx == 0, p_v, p_hv))
        out[0, 0] = p.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("bh", "bw", "rnd",
                                             "interpret"))
def _mc_chroma(ctiles, selc, bh: int, bw: int, rnd: int,
               interpret: bool = False):
    nmb = bh * bw
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nmb,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 32, 256),
                         lambda i, s: (0, s[i * 2] >> 16,
                                       s[i * 2] & 0xFFFF, 0, 0)),
            pl.BlockSpec((1, 1, 1, 32, 256),
                         lambda i, s: (1, s[i * 2] >> 16,
                                       s[i * 2] & 0xFFFF, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 8),
                         lambda i, s: (i // bw, i % bw, 0, 0)),
            pl.BlockSpec((1, 1, 8, 8),
                         lambda i, s: (i // bw, i % bw, 0, 0)),
        ])
    pu, pv = pl.pallas_call(
        functools.partial(_chroma_kernel, rnd=rnd),
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((bh, bw, 8, 8), jnp.uint8),
                   jax.ShapeDtypeStruct((bh, bw, 8, 8), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(selc, ctiles, ctiles)
    return pu, pv


# ---------------------------------------------------------------------------
# chroma, lane-packed group form
# ---------------------------------------------------------------------------


def _chroma_group_kernel(s_ref, *refs, rnd: int):
    """8 MBs per grid step, lane-packed like _refine_group_kernel: the
    8x8 chroma MC of every MB runs once on [8, 256] vectors. The
    half-pel flags vary per MB, so all four interpolation variants are
    computed and selected through per-lane flag fields."""
    wu = refs[:_G]
    wv = refs[_G:2 * _G]
    pu_o, pv_o = refs[2 * _G], refs[2 * _G + 1]
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    r1 = 1 - rnd
    r2 = 2 - rnd

    # per-lane half-pel flag fields (one segment per MB)
    fyv = jnp.zeros((1, 256), jnp.int32)
    fxv = jnp.zeros((1, 256), jnp.int32)
    for g in range(_G):
        rr = s_ref[(i * _G + g) * 2 + 1]
        m = (lane >= 32 * g) & (lane < 32 * (g + 1))
        fyv = jnp.where(m, (rr >> 8) & 1, fyv)
        fxv = jnp.where(m, rr & 1, fxv)

    for wins, out in ((wu, pu_o), (wv, pv_o)):
        acc = jnp.zeros((16, 256), jnp.int32)
        for g in range(_G):
            rr = s_ref[(i * _G + g) * 2 + 1]
            w = wins[g][0, 0, 0].astype(jnp.int32)
            w = pltpu.roll(w, (32 - ((rr >> 24) & 255)) & 31, 0)[0:16, :]
            w = pltpu.roll(w, (256 - ((rr >> 16) & 255)) & 255, 1)
            w = jnp.where(lane < 32, w, 0)
            if g:
                w = pltpu.roll(w, 32 * g, 1)
            acc = acc + w
        accx = pltpu.roll(acc, 255, 1)      # segment col j -> j + 1
        a = acc[0:8, :]
        b = accx[0:8, :]
        c = acc[1:9, :]
        d = accx[1:9, :]
        p_h = (a + b + r1) >> 1
        p_v = (a + c + r1) >> 1
        p_hv = (a + b + c + d + r2) >> 2
        p = jnp.where(fyv == 0, jnp.where(fxv == 0, a, p_h),
                      jnp.where(fxv == 0, p_v, p_hv))
        out[0] = p.astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("bh", "bw", "rnd",
                                             "interpret"))
def _mc_chroma_group(ctiles, selc, bh: int, bw: int, rnd: int,
                     interpret: bool = False):
    """Group form of _mc_chroma: returns (pu, pv) as [bh,bw,8,8]."""
    nmb = bh * bw
    ng = (nmb + _G - 1) // _G
    npad = ng * _G
    if npad > nmb:
        selc = jnp.concatenate(
            [selc, jnp.zeros(2 * (npad - nmb), selc.dtype)])

    def wspec(g, plane):
        def imap(i, s, g=g, plane=plane):
            w = s[(i * _G + g) * 2]
            return (plane, w >> 16, w & 0xFFFF, 0, 0)
        return pl.BlockSpec((1, 1, 1, 32, 256), imap)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ng,),
        in_specs=[wspec(g, 0) for g in range(_G)]
        + [wspec(g, 1) for g in range(_G)],
        out_specs=[pl.BlockSpec((1, 8, 256), lambda i, s: (i, 0, 0)),
                   pl.BlockSpec((1, 8, 256), lambda i, s: (i, 0, 0))])
    pu, pv = pl.pallas_call(
        functools.partial(_chroma_group_kernel, rnd=rnd),
        grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((ng, 8, 256), jnp.uint8),
                   jax.ShapeDtypeStruct((ng, 8, 256), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(selc, *([ctiles] * (2 * _G)))

    def unpack(p):
        return p.reshape(ng, 8, _G, 32)[:, :, :, :8] \
            .transpose(0, 2, 1, 3).reshape(npad, 8, 8)[:nmb] \
            .reshape(bh, bw, 8, 8)

    return unpack(pu), unpack(pv)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _chroma_mv(mv_h):
    """Luma half-pel MV -> chroma half-pel MV (spec /2 with sticky
    half, per component)."""
    a = jnp.abs(mv_h)
    return jnp.sign(mv_h) * ((a >> 1) | (a & 1))


def hpel_refine_mc(cur_y, ref_y, ref_u, ref_v, mv_i, rnd: int = 0,
                   interpret: bool = False):
    """Half-pel refinement around integer MVs + full MC of all planes.

    cur_y [H, W] f32/int; ref_* integer-valued planes (recon, 0..255);
    mv_i [bh, bw, 2] int32 pixel units from the integer search.
    Returns (mv_h [bh,bw,2] half-pel, pred_y [H,W] f32, pred_u, pred_v)
    — bit-identical to motion._hpel_refine + motion.mc_hpel.
    """
    h, w = cur_y.shape
    bh, bw = h // 16, w // 16
    nmb = bh * bw

    lt = _prep_plane(ref_y, 48)
    ct = jnp.stack([jnp.pad(ref_u.astype(jnp.uint8),
                            ((PAD, PAD), (PAD, PAD)), mode="edge"),
                    jnp.pad(ref_v.astype(jnp.uint8),
                            ((PAD, PAD), (PAD, PAD)), mode="edge")])
    hc, wc = ct.shape[1], ct.shape[2]
    h2 = _align_up(hc, 16) + 32
    w2 = _align_up(wc, 128) + 128
    ct = jnp.pad(ct, ((0, 0), (0, h2 - hc), (0, w2 - wc)))
    ct = jax.vmap(lambda p: _tile_plane(p, 32))(ct)

    # luma selectors from mv_i (device int math; scalar-prefetched)
    y0 = (jnp.arange(bh) * 16)[:, None]
    x0 = (jnp.arange(bw) * 16)[None, :]
    sy = y0 + mv_i[..., 0] - 1 + PAD
    sx = x0 + mv_i[..., 1] - 1 + PAD
    sel = jnp.stack([((sy >> 4) << 16) | (sx >> 7),
                     ((sy & 15) << 8) | (sx & 127),
                     mv_i[..., 0], mv_i[..., 1]],
                    axis=-1).reshape(-1).astype(jnp.int32)

    cur_b = cur_y.astype(jnp.uint8).reshape(bh, 16, bw, 16) \
        .transpose(0, 2, 1, 3)
    pred_b, ddy, ddx = _refine_mc_luma_group(lt, sel, cur_b, bh, bw,
                                             rnd, interpret)
    pred_y = pred_b.transpose(0, 2, 1, 3).reshape(h, w) \
        .astype(jnp.float32)
    mv_h = 2 * mv_i + jnp.stack([ddy, ddx], axis=-1) \
        .reshape(bh, bw, 2)

    # chroma selectors from the refined MV
    mv_c = _chroma_mv(mv_h)
    icy = mv_c[..., 0] >> 1
    icx = mv_c[..., 1] >> 1
    cy = y0 // 2 + icy + PAD
    cx = x0 // 2 + icx + PAD
    selc = jnp.stack([((cy >> 4) << 16) | (cx >> 7),
                      (((cy & 15) << 24) | ((cx & 127) << 16)
                       | ((mv_c[..., 0] & 1) << 8) | (mv_c[..., 1] & 1))],
                     axis=-1).reshape(-1).astype(jnp.int32)
    pu, pv = _mc_chroma_group(ct, selc, bh, bw, rnd, interpret)
    pred_u = pu.transpose(0, 2, 1, 3).reshape(h // 2, w // 2) \
        .astype(jnp.float32)
    pred_v = pv.transpose(0, 2, 1, 3).reshape(h // 2, w // 2) \
        .astype(jnp.float32)
    return mv_h, pred_y, pred_u, pred_v
