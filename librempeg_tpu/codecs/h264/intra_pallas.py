"""H.264 scattered-intra reconstruction as a Pallas TPU kernel.

The XLA lax.scan intra pass (device_recon._intra_scan) costs ~35 us per
scan step at 1080p -- per listed intra MB it dynamic-slices a 17x25
context tile out of the full plane and runs a 9-way lax.switch per 4x4
block, all of which lowers to full-plane gathers and dead branches.
This kernel replaces it with a sequential Pallas grid (one step per
listed intra MB, raster order = spec §8.3 dependency order): the
planes stay in VMEM for the whole pass, each step loads one 128-aligned
window, normalizes it with a dynamic lane roll (the deblock kernel's
proven Mosaic recipe), and reconstructs the MB at STATIC window
coordinates.

Everything inside the kernel is full-width [1, N] ROW arithmetic --
the one vector shape Mosaic's layout inference handles robustly
(probed on v5e: value-level concatenate of lane-offset slices is
rejected with "offset mismatch on non-concat dimension", but row
madds, [1,1]->[1,N] single-dim broadcasts, static/dynamic lane rolls,
iota-mask selects, pltpu.repeat, [NxN] transposes and sublane concats
of full rows all compile). The spec's intra predictors are affine in
the neighbor samples, so each prediction mode is a set of coefficient
ROWS in a VMEM table, indexed by a scalar-prefetched *effective* mode
(availability folded in by the XLA glue):

    pred[p] = (sum_c TAB[mode, c, p] * neighbor_c  + TAB[mode, bias, p])
              >> shift

which the kernel evaluates as one multiply-add per neighbor over a
[1, 256] row (output pixel p on lanes). The only non-affine mode is
plane prediction (nested rounded shifts); its inner sums H/V/corner
ARE affine and ride the same table at aux output lanes, with the few
remaining scalar ops done directly. Reconstructed 4x4 / row pieces are
placed back into the window rows with the periodic-roll trick:
pltpu.repeat makes a [1,16] piece periodic so a (target mod 16) lane
roll aligns it anywhere, and an iota mask writes exactly the target
lanes.

Bit-exactness vs device_recon._intra_scan is asserted in
tests/test_h264_device.py.

Behavioral reference: /root/reference/libavcodec/h264_mb.c +
pred templates in h264pred_template.c (reimplemented, not translated).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from librempeg_tpu.codecs.h264 import device_recon as DR

# neighbor vector component indices of device_recon's matrix layout
_J_T = 0      # t0..3
_J_TR = 4     # tr0..3
_J_L = 8      # l0..3
_J_LT = 12
_J_ONE = 13

_SCAL_W = 32                # scalar-prefetch row width per step


def _tt(i):
    """tt[i] of the spec (top extended by top-right)."""
    return _J_T + i if i < 4 else _J_TR + (i - 4)


def _build_i4_matrices() -> np.ndarray:
    """[12, 16, 14] int32: effective mode -> (pixel y*4+x) -> coeff over
    the 14-component neighbor vector, such that pred = (M[e] @ n) >> 4
    exactly reproduces §8.3.1.2 (mirrors device_recon._pred4_branches).
    Effective modes 0..8 = spec modes (DC = both-available); 9 = DC
    top-only, 10 = DC left-only, 11 = DC neither (128)."""
    M = np.zeros((12, 16, 14), np.int32)
    T, L, LT, ONE = (lambda i: _J_T + i), (lambda i: _J_L + i), \
        _J_LT, _J_ONE
    for y in range(4):
        for x in range(4):
            p = y * 4 + x
            # 0: vertical
            M[0, p, T(x)] = 16
            # 1: horizontal
            M[1, p, L(y)] = 16
            # 2: DC (both) / 9: top / 10: left / 11: 128
            for i in range(4):
                M[2, p, T(i)] += 2
                M[2, p, L(i)] += 2
                M[9, p, T(i)] += 4
                M[10, p, L(i)] += 4
            M[2, p, ONE] = 8
            M[9, p, ONE] = 8
            M[10, p, ONE] = 8
            M[11, p, ONE] = 128 * 16
            # 3: diagonal down-left
            s = x + y
            if x == 3 and y == 3:
                M[3, p, _tt(6)] += 4
                M[3, p, _tt(7)] += 12
            else:
                M[3, p, _tt(s)] += 4
                M[3, p, _tt(min(s + 1, 7))] += 8
                M[3, p, _tt(min(s + 2, 7))] += 4
            M[3, p, ONE] = 8
            # 4: diagonal down-right
            z = x - y
            if z > 0:
                M[4, p, T(z)] += 4
                M[4, p, T(z - 1)] += 8
                M[4, p, T(z - 2) if z >= 2 else LT] += 4
            elif z < 0:
                za = -z
                M[4, p, L(za)] += 4
                M[4, p, L(za - 1)] += 8
                M[4, p, L(za - 2) if za >= 2 else LT] += 4
            else:
                M[4, p, T(0)] += 4
                M[4, p, LT] += 8
                M[4, p, L(0)] += 4
            M[4, p, ONE] = 8
            # 5: vertical-right
            z = 2 * x - y
            i_ = x - (y >> 1)
            if z >= 0 and z % 2 == 0:
                M[5, p, T(i_ - 1) if i_ >= 1 else LT] += 8
                M[5, p, T(i_)] += 8
            elif z >= 0:
                a = (T(i_ - 2) if i_ >= 2 else (LT if i_ == 1 else L(0)))
                M[5, p, a] += 4
                M[5, p, T(i_ - 1) if i_ >= 1 else LT] += 8
                M[5, p, T(i_)] += 4
            elif z == -1:
                M[5, p, L(0)] += 4
                M[5, p, LT] += 8
                M[5, p, T(0)] += 4
            else:
                M[5, p, L(min(max(y - 1, 0), 3))] += 4
                M[5, p, L(min(max(y - 2, 0), 3))] += 8
                M[5, p, L(y - 3) if y - 3 >= 0 else LT] += 4
            M[5, p, ONE] = 8
            # 6: horizontal-down (VR mirrored)
            z = 2 * y - x
            i_ = y - (x >> 1)
            if z >= 0 and z % 2 == 0:
                M[6, p, L(i_ - 1) if i_ >= 1 else LT] += 8
                M[6, p, L(i_)] += 8
            elif z >= 0:
                a = (L(i_ - 2) if i_ >= 2 else (LT if i_ == 1 else T(0)))
                M[6, p, a] += 4
                M[6, p, L(i_ - 1) if i_ >= 1 else LT] += 8
                M[6, p, L(i_)] += 4
            elif z == -1:
                M[6, p, T(0)] += 4
                M[6, p, LT] += 8
                M[6, p, L(0)] += 4
            else:
                M[6, p, T(min(max(x - 1, 0), 3))] += 4
                M[6, p, T(min(max(x - 2, 0), 3))] += 8
                M[6, p, T(x - 3) if x - 3 >= 0 else LT] += 4
            M[6, p, ONE] = 8
            # 7: vertical-left
            i_ = x + (y >> 1)
            if y % 2 == 0:
                M[7, p, _tt(min(i_, 7))] += 8
                M[7, p, _tt(min(i_ + 1, 7))] += 8
            else:
                M[7, p, _tt(min(i_, 7))] += 4
                M[7, p, _tt(min(i_ + 1, 7))] += 8
                M[7, p, _tt(min(i_ + 2, 7))] += 4
            M[7, p, ONE] = 8
            # 8: horizontal-up
            z = x + 2 * y
            i_ = y + (x >> 1)
            if z > 5:
                M[8, p, L(3)] += 16
            elif z == 5:
                M[8, p, L(2)] += 4
                M[8, p, L(3)] += 12
                M[8, p, ONE] = 8
            elif z % 2 == 0:
                M[8, p, L(min(i_, 3))] += 8
                M[8, p, L(min(i_ + 1, 3))] += 8
                M[8, p, ONE] = 8
            else:
                M[8, p, L(min(i_, 3))] += 4
                M[8, p, L(min(i_ + 1, 3))] += 8
                M[8, p, L(min(i_ + 2, 3))] += 4
                M[8, p, ONE] = 8
    return M


# ---------------------------------------------------------------------------
# coefficient-row tables: row index = mode * stride + input index,
# lanes = output pixels (+ aux outputs); kernel does one madd per input
# ---------------------------------------------------------------------------
# Intra_4x4: inputs (kernel madd index c) 0 = lt, 1..4 = t0..3,
# 5..8 = tr0..3, 9..12 = l0..3, 13 = bias; output lanes 0..15 = y*4+x.
_I4_NIN = 14
_I4_STRIDE = 16


def _build_t4_tab() -> np.ndarray:
    M = _build_i4_matrices()                     # [12, 16, 14]
    tab = np.zeros((12 * _I4_STRIDE, 256), np.int32)
    jmap = {0: _J_LT, 13: _J_ONE}
    for i in range(4):
        jmap[1 + i] = _J_T + i
        jmap[5 + i] = _J_TR + i
        jmap[9 + i] = _J_L + i
    for e in range(12):
        for c in range(_I4_NIN):
            tab[e * _I4_STRIDE + c, 0:16] = M[e, :, jmap[c]]
    return tab


# Intra_16x16: inputs 0 = lt, 1..16 = t0..15, 17..32 = l0..15,
# 33 = bias; output lanes 0..255 = y*16+x (pred, >>5), aux lanes
# 256 = H, 257 = V, 258 = corner-a (raw, plane mode §8.3.3.4).
# Effective modes: 0 = V, 1 = H, 2 = DC both, 3 = plane (aux only),
# 4 = DC top, 5 = DC left, 6 = DC none.
_I16_NIN = 34
_I16_STRIDE = 40


def _build_t16_tab() -> np.ndarray:
    tab = np.zeros((7 * _I16_STRIDE, 384), np.int32)
    for e in range(7):
        base = e * _I16_STRIDE
        for y in range(16):
            for x in range(16):
                p = y * 16 + x
                if e == 0:
                    tab[base + 1 + x, p] = 32
                elif e == 1:
                    tab[base + 17 + y, p] = 32
                elif e == 2:
                    for i in range(16):
                        tab[base + 1 + i, p] += 1
                        tab[base + 17 + i, p] += 1
                    tab[base + _I16_NIN - 1, p] = 16
                elif e == 4:
                    for i in range(16):
                        tab[base + 1 + i, p] += 2
                    tab[base + _I16_NIN - 1, p] = 16
                elif e == 5:
                    for i in range(16):
                        tab[base + 17 + i, p] += 2
                    tab[base + _I16_NIN - 1, p] = 16
                elif e == 6:
                    tab[base + _I16_NIN - 1, p] = 128 * 32
        # aux (all modes): H at 256, V at 257, a at 258
        for x in range(16):
            tab[base + 1 + x, 256] = x - 7
            tab[base + 17 + x, 257] = x - 7
        tab[base + 0, 256] = -8
        tab[base + 0, 257] = -8
        tab[base + 1 + 15, 258] = 16
        tab[base + 17 + 15, 258] = 16
    return tab


# Chroma 8x8: inputs 0 = lt, 1..8 = t0..7, 9..16 = l0..7, 17 = bias;
# output lanes 0..63 = y*8+x (pred, >>5), aux 64 = H, 65 = V, 66 = a.
# Effective modes: 0 = DC both, 1 = DC top, 2 = DC left, 3 = DC none,
# 4 = H, 5 = V, 6 = plane (aux only). DC quadrant preferences of
# §8.3.4.1-3 are folded per variant.
_C_NIN = 18
_C_STRIDE = 24


def _build_c_tab() -> np.ndarray:
    tab = np.zeros((7 * _C_STRIDE, 256), np.int32)

    def add_quad(base, qy, qx, kind, half_t, half_l):
        # kind: 'b' = (ts+ls+4)>>3, 't' = (ts+2)>>2, 'l' = (ls+2)>>2,
        # 'n' = 128; all expressed at >>5 scale
        for y in range(4 * qy, 4 * qy + 4):
            for x in range(4 * qx, 4 * qx + 4):
                p = y * 8 + x
                if kind == "b":
                    for i in range(4):
                        tab[base + 1 + 4 * half_t + i, p] += 4
                        tab[base + 9 + 4 * half_l + i, p] += 4
                    tab[base + _C_NIN - 1, p] += 16
                elif kind == "t":
                    for i in range(4):
                        tab[base + 1 + 4 * half_t + i, p] += 8
                    tab[base + _C_NIN - 1, p] += 16
                elif kind == "l":
                    for i in range(4):
                        tab[base + 9 + 4 * half_l + i, p] += 8
                    tab[base + _C_NIN - 1, p] += 16
                else:
                    tab[base + _C_NIN - 1, p] += 128 * 32

    for e in range(7):
        base = e * _C_STRIDE
        if e == 0:                                 # DC, both available
            add_quad(base, 0, 0, "b", 0, 0)
            add_quad(base, 0, 1, "t", 1, 0)
            add_quad(base, 1, 0, "l", 0, 1)
            add_quad(base, 1, 1, "b", 1, 1)
        elif e == 1:                               # DC, top only
            add_quad(base, 0, 0, "t", 0, 0)
            add_quad(base, 0, 1, "t", 1, 0)
            add_quad(base, 1, 0, "t", 0, 1)
            add_quad(base, 1, 1, "t", 1, 1)
        elif e == 2:                               # DC, left only
            add_quad(base, 0, 0, "l", 0, 0)
            add_quad(base, 0, 1, "l", 0, 0)
            add_quad(base, 1, 0, "l", 0, 1)
            add_quad(base, 1, 1, "l", 0, 1)
        elif e == 3:                               # DC, none
            for q in ((0, 0), (0, 1), (1, 0), (1, 1)):
                add_quad(base, q[0], q[1], "n", 0, 0)
        elif e == 4:                               # horizontal
            for y in range(8):
                for x in range(8):
                    tab[base + 9 + y, y * 8 + x] = 32
        elif e == 5:                               # vertical
            for y in range(8):
                for x in range(8):
                    tab[base + 1 + x, y * 8 + x] = 32
        # aux (all modes)
        for x in range(8):
            tab[base + 1 + x, 64] = x - 3
            tab[base + 9 + x, 65] = x - 3
        tab[base + 0, 64] = -4
        tab[base + 0, 65] = -4
        tab[base + 1 + 7, 66] = 16
        tab[base + 9 + 7, 66] = 16
    return tab


_T4TAB = _build_t4_tab()
_T16TAB = _build_t16_tab()
_CTAB = _build_c_tab()

# decode order of the 16 4x4 blocks and top-right availability class
_BLK4_DEC = DR._BLK4_DEC
_ORD4 = DR._ORD4


def build_intra_scalars(ilist, kind, info, i4modes, mb_w: int,
                        mb_h: int, icap: int):
    """XLA glue: [icap, _SCAL_W] int32 per-step scalar rows.

    Row: [valid, mi, my, mx, is_i4, e16, ecm, avtr_bits,
    emode4[k] for decode-order k=0..15, pad...]. Availability is folded
    into the effective mode indices here so the kernel never branches
    on it."""
    m = ilist[:icap].astype(jnp.int32)
    valid = (m >= 0).astype(jnp.int32)
    mi = jnp.maximum(m, 0)
    my = mi // mb_w
    mx = mi % mb_w
    avt = (my > 0).astype(jnp.int32)
    avl = (mx > 0).astype(jnp.int32)
    kindm = kind[mi].astype(jnp.int32)
    infom = info[mi].astype(jnp.int32)
    is_i4 = (kindm == 2).astype(jnp.int32)
    m16 = jnp.clip(infom & 15, 0, 3)
    e16 = jnp.where(
        m16 == 2,
        jnp.where((avt & avl) == 1, 2,
                  jnp.where(avt == 1, 4, jnp.where(avl == 1, 5, 6))),
        m16)
    cmode = jnp.clip((infom >> 4) & 15, 0, 3)
    # chroma effective mode: DC -> availability variant; H->4 V->5
    # plane->6 (raw cmode: 0=DC 1=H 2=V 3=plane, §8.3.4)
    ecm = jnp.where(
        cmode == 0,
        jnp.where((avt & avl) == 1, 0,
                  jnp.where(avt == 1, 1, jnp.where(avl == 1, 2, 3))),
        jnp.where(cmode == 1, 4, jnp.where(cmode == 2, 5, 6)))

    cols = [valid, mi, my, mx, is_i4, e16, ecm]
    avtr_bits = jnp.zeros_like(mi)
    emodes = []
    for k, (by, bx) in enumerate(_BLK4_DEC):
        if by > 0 and bx < 3:
            tr_ok = bool(_ORD4[(by - 1) * 4 + bx + 1] < _ORD4[by * 4 + bx])
            av_tr = jnp.full_like(mi, int(tr_ok))
        elif by > 0:
            av_tr = jnp.zeros_like(mi)
        elif bx < 3:
            av_tr = avt
        else:
            av_tr = avt & (mx + 1 < mb_w).astype(jnp.int32)
        avtr_bits = avtr_bits | (av_tr << k)
        avt_b = jnp.ones_like(avt) if by > 0 else avt
        avl_b = jnp.ones_like(avl) if bx > 0 else avl
        mode = jnp.clip(i4modes[mi, by * 4 + bx].astype(jnp.int32), 0, 8)
        em = jnp.where(
            mode == 2,
            jnp.where((avt_b & avl_b) == 1, 2,
                      jnp.where(avt_b == 1, 9,
                                jnp.where(avl_b == 1, 10, 11))),
            mode)
        emodes.append(em)
    cols = cols + [avtr_bits] + emodes
    rows = jnp.stack(cols, axis=1)                       # [icap, 24]
    return jnp.pad(rows, ((0, 0), (0, _SCAL_W - rows.shape[1])))


def _ci(n=256):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _madd(tab_ref, base, nin, src_fn, width):
    """acc[0, p] = sum_c tab[base+c, p] * src_c + tab[base+nin-1, p]
    (last input row is the bias, multiplied by 1)."""
    acc = tab_ref[pl.ds(base + nin - 1, 1), :]         # bias row first
    for c in range(nin - 1):
        coeff = tab_ref[pl.ds(base + c, 1), :]
        acc = acc + coeff * jnp.broadcast_to(src_fn(c), (1, width))
    return acc


def _intra_kernel(mb_w: int, mb_h: int,
                  s_ref, t4_ref, t16_ref, tc_ref, lres_ref, cres_ref,
                  ypi, upi, vpi, yo, uo, vo):
    i = pl.program_id(0)
    valid = s_ref[i * _SCAL_W + 0]
    my = s_ref[i * _SCAL_W + 2]
    mx = s_ref[i * _SCAL_W + 3]
    is_i4 = s_ref[i * _SCAL_W + 4]
    e16 = s_ref[i * _SCAL_W + 5]
    ecm = s_ref[i * _SCAL_W + 6]
    avtr = s_ref[i * _SCAL_W + 7]
    ci = _ci()

    # luma window: MB at rows 16..32, cols 4..20 (after the roll);
    # row 15 = top neighbors, TT row 3 = left neighbor column
    p = mx * 16 + 128
    xa = pl.multiple_of((p - 4) // 128 * 128, 128)
    ro = (p - 4) - xa
    r0 = pl.multiple_of(my * 16, 16)

    def load_rows():
        win = yo[pl.ds(r0, 32), pl.ds(xa, 256)].astype(jnp.int32)
        win = pltpu.roll(win, -ro, 1)
        TT = win[:, 0:32].T
        return [win[r:r + 1, :] for r in range(32)], TT

    def store_rows(rows):
        win = jnp.concatenate(rows, axis=0)
        win = pltpu.roll(win, ro, 1)
        yo[pl.ds(r0, 32), pl.ds(xa, 256)] = win.astype(yo.dtype)

    @pl.when((valid == 1) & (is_i4 == 1))
    def _():
        rows, TT = load_rows()
        recs = {}
        for k, (by, bx) in enumerate(_BLK4_DEC):
            ty, tx = 15 + 4 * by, 4 + 4 * bx
            rowN = pltpu.roll(rows[ty], (256 - (tx - 1)) % 256, 1)
            # top-right substitution: lanes 5..8 <- t3 when tr missing
            trbit = (avtr >> k) & 1
            t3 = jnp.broadcast_to(rowN[:, 4:5], (1, 256))
            rowN = jnp.where((ci >= 5) & (ci < 9) & ((ci * 0 + trbit) == 0),
                             t3, rowN)
            em = s_ref[i * _SCAL_W + 8 + k]
            base = pl.multiple_of(em * _I4_STRIDE, _I4_STRIDE)
            if bx == 0:
                lsrc = [TT[3:4, 16 + 4 * by + j:17 + 4 * by + j]
                        for j in range(4)]
            else:
                rl = recs[(by, bx - 1)]
                lsrc = [rl[:, 4 * j + 3:4 * j + 4] for j in range(4)]

            def src(c, rowN=rowN, lsrc=lsrc):
                if c < 9:                          # lt, t0..3, tr0..3
                    return rowN[:, c:c + 1]
                return lsrc[c - 9]                 # l0..3

            acc = _madd(t4_ref, base, _I4_NIN, src, 256)
            pred = acc >> 4
            res = lres_ref[0, 16 + k:17 + k, :]    # [1,16] block-major
            rec = jnp.clip(pred[:, 0:16] + res, 0, 255)
            recs[(by, bx)] = rec
            rec256 = pltpu.repeat(rec, 16, axis=1)
            for y_ in range(4):
                placed = pltpu.roll(rec256, (tx - 4 * y_) % 16, 1)
                r = ty + 1 + y_
                rows[r] = jnp.where((ci >= tx) & (ci < tx + 4), placed,
                                    rows[r])
        store_rows(rows)

    @pl.when((valid == 1) & (is_i4 == 0))
    def _():
        rows, TT = load_rows()
        rowN = pltpu.roll(rows[15], 256 - 3, 1)    # lt@0, t0..15@1..16

        def src16(c, rowN=rowN, TT=TT):
            if c < 17:                             # lt, t0..15
                return rowN[:, c:c + 1]
            return TT[3:4, 16 + (c - 17):17 + (c - 17)]   # l0..15

        base = pl.multiple_of(e16 * _I16_STRIDE, 8)
        acc = _madd(t16_ref, base, _I16_NIN, src16, 384)
        pred = acc[:, 0:256] >> 5
        h = acc[:, 256:257]
        vv = acc[:, 257:258]
        a = acc[:, 258:259]
        b = (5 * h + 32) >> 6
        c_ = (5 * vv + 32) >> 6
        pm = (ci * 0 + e16) == 3
        for y_ in range(16):
            prow = jnp.clip(
                (jnp.broadcast_to(a + c_ * (y_ - 7), (1, 256))
                 + jnp.broadcast_to(b, (1, 256)) * (ci - 7) + 16) >> 5,
                0, 255)
            ptab = pltpu.roll(pred, (256 + 4 - 16 * y_) % 256, 1)
            prow = pltpu.roll(prow, 4, 1)
            sel = jnp.where(pm, prow, ptab)
            res = lres_ref[0, y_:y_ + 1, :]        # [1,16] raster
            resw = pltpu.roll(pltpu.repeat(res, 16, axis=1), 4, 1)
            r = 16 + y_
            rows[r] = jnp.where((ci >= 4) & (ci < 20),
                                jnp.clip(sel + resw, 0, 255), rows[r])
        store_rows(rows)

    # ---------------- chroma (both luma kinds) ----------------
    pc = mx * 8 + 128
    xac = pl.multiple_of((pc - 2) // 128 * 128, 128)
    roc = (pc - 2) - xac
    rc0 = pl.multiple_of(my * 8, 8)
    pmc = (ci * 0 + ecm) == 6
    cbase = pl.multiple_of(ecm * _C_STRIDE, 8)

    @pl.when(valid == 1)
    def _():
        for c_ref, pi in ((uo, 0), (vo, 1)):
            cwin = c_ref[pl.ds(rc0, 16), pl.ds(xac, 256)] \
                .astype(jnp.int32)
            cwin = pltpu.roll(cwin, -roc, 1)
            crows = [cwin[r:r + 1, :] for r in range(16)]
            TTc = cwin[:, 0:16].T                  # row 1 = left col
            rowNc = pltpu.roll(crows[7], 256 - 1, 1)  # lt@0, t@1..8

            def srcc(c, rowNc=rowNc, TTc=TTc):
                if c < 9:                          # lt, t0..7
                    return rowNc[:, c:c + 1]
                return TTc[1:2, 8 + (c - 9):9 + (c - 9)]  # l0..7

            acc = _madd(tc_ref, cbase, _C_NIN, srcc, 256)
            pred = acc >> 5
            h = acc[:, 64:65]
            vv = acc[:, 65:66]
            a = acc[:, 66:67]
            b = (17 * h + 16) >> 5
            c_ = (17 * vv + 16) >> 5
            for y_ in range(8):
                prow = jnp.clip(
                    (jnp.broadcast_to(a + c_ * (y_ - 3), (1, 256))
                     + jnp.broadcast_to(b, (1, 256)) * (ci - 3) + 16)
                    >> 5, 0, 255)
                ptab = pltpu.roll(pred, (256 + 2 - 8 * y_) % 256, 1)
                prow = pltpu.roll(prow, 2, 1)
                sel = jnp.where(pmc, prow, ptab)
                res = cres_ref[0, pi, y_:y_ + 1, :]     # [1,8] raster
                resw = pltpu.roll(pltpu.repeat(res, 32, axis=1), 2, 1)
                r = 8 + y_
                crows[r] = jnp.where((ci >= 2) & (ci < 10),
                                     jnp.clip(sel + resw, 0, 255),
                                     crows[r])
            cwin = jnp.concatenate(crows, axis=0)
            cwin = pltpu.roll(cwin, roc, 1)
            c_ref[pl.ds(rc0, 16), pl.ds(xac, 256)] = \
                cwin.astype(c_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "icap",
                                             "interpret"))
def intra_scan_pallas(y, u, v, scal, lres_t, cres_t, mb_w: int,
                      mb_h: int, icap: int, interpret: bool = False):
    """Reconstruct the listed intra MBs in place. y/u/v: uint8 planes
    (pre-deblock). scal: build_intra_scalars output. lres_t
    [nmb, 16, 16] MB-tile luma residuals (i16 DC folded); cres_t
    [nmb, 2, 8, 8] MB-tile chroma residuals."""
    H, W = mb_h * 16, mb_w * 16
    nmb = mb_w * mb_h
    yp = jnp.pad(y, ((16, 16), (128, 256)))
    up = jnp.pad(u, ((8, 8), (128, 256)))
    vp = jnp.pad(v, ((8, 8), (128, 256)))

    # luma residual: rows 0..15 raster (i16 path), rows 16..31 the 16
    # decode-order blocks in pixel-major order (i4 path)
    perm = np.array([4 * by + bx for by, bx in _BLK4_DEC], np.int32)
    lblk = lres_t.reshape(nmb, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(nmb, 16, 16)[:, perm, :]
    lres2 = jnp.concatenate([lres_t, lblk], axis=1)      # [nmb, 32, 16]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(icap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # t4 table
            pl.BlockSpec(memory_space=pltpu.VMEM),        # t16 table
            pl.BlockSpec(memory_space=pltpu.VMEM),        # chroma table
            pl.BlockSpec((1, 32, 16),
                         lambda i, s: (s[i * _SCAL_W + 1], 0, 0)),
            pl.BlockSpec((1, 2, 8, 8),
                         lambda i, s: (s[i * _SCAL_W + 1], 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # planes
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3)

    kern = functools.partial(_intra_kernel, mb_w, mb_h)
    yd, ud, vd = pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct(yp.shape, yp.dtype),
                   jax.ShapeDtypeStruct(up.shape, up.dtype),
                   jax.ShapeDtypeStruct(vp.shape, vp.dtype)],
        input_output_aliases={6: 0, 7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(scal.reshape(-1), jnp.asarray(_T4TAB), jnp.asarray(_T16TAB),
      jnp.asarray(_CTAB), lres2, cres_t, yp, up, vp)
    return (yd[16:16 + H, 128:128 + W],
            ud[8:8 + H // 2, 128:128 + W // 2],
            vd[8:8 + H // 2, 128:128 + W // 2])
