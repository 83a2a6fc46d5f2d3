"""On-device H.264 P-frame reconstruction + in-loop deblocking.

The decode side of the flagship transcode keeps the DPB in device HBM:
per frame the host uploads only the entropy tensors (sparse transform
coefficients + the motion field, a few hundred KB) and every pixel
operation -- dequant, inverse transform, quarter-pel MC, deblocking --
runs inside one jitted XLA program. Nothing pixel-sized ever crosses
the host<->device link, which on a tunneled TPU is the decode
bottleneck by an order of magnitude.

Scope: P frames, including scattered intra MBs (intra-in-P refresh):
inter MBs reconstruct fully in parallel, then a raster-order lax.scan
rebuilds the (typically ~1%) intra MBs -- each step predicts one MB
from its already-final neighbors (raster order is exactly the spec
dependency order for intra: left/top/top-right all precede). Frames
that are mostly intra (IDR refreshes) take the exact host path
(native/h264.cpp) and upload their pixels once -- amortized over the
GOP. Everything here is bit-exact with the host reconstruction
(asserted in tests/test_h264_device.py).

Deblocking follows the spec's macroblock raster order (§8.7: per MB,
vertical edges left-to-right then horizontal top-to-bottom), expressed
as an anti-diagonal wavefront: MBs on one diagonal depend only on
their left and top neighbors, so each lax.scan step filters a whole
diagonal (up to mb_h MBs) in parallel -- mb_w + mb_h - 1 steps per
frame instead of mb_w * mb_h.

Behavioral reference: /root/reference/libavcodec/h264_loopfilter.c,
h264qpel_template.c, h264_mb.c (reimplemented, not translated; the
integer math mirrors codecs/h264/recon.py + native/h264.cpp which are
validated bit-exact against the reference decoder).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.codecs.h264 import recon as R

PAD = R.PAD            # 32
PADC = R.PADC          # 16

# dequant V table (§8.5.9) expanded to per-position [6][16]
_VPOS = np.array([[R._V[m][p] for p in
                   [0, 2, 0, 2, 2, 1, 2, 1, 0, 2, 0, 2, 2, 1, 2, 1]]
                  for m in range(6)], np.int32)
_IZZ = np.argsort(np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7,
                            11, 14, 15]))

# qpel plane-pair map (recon.py _QPEL_MAP) as arrays indexed fy*4+fx
_QM = np.zeros((16, 6), np.int32)      # p1, d1y, d1x, p2, d2y, d2x
for (fx, fy), (p1, (d1y, d1x), p2, (d2y, d2x)) in R._QPEL_MAP.items():
    _QM[fy * 4 + fx] = (p1, d1y, d1x, p2, d2y, d2x)

# deblock spec tables (8-16/8-17)
_ALPHA = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
    226, 255, 255], np.int32)
_BETA = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
    11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18], np.int32)
_TC0 = np.array([
    [0, 0, 0]] * 17 + [[0, 0, 1]] * 4 + [[0, 1, 1], [0, 1, 1], [1, 1, 1],
    [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 2], [1, 1, 2], [1, 1, 2],
    [1, 1, 2], [1, 2, 3], [1, 2, 3], [2, 2, 3], [2, 2, 4], [2, 3, 4],
    [2, 3, 4], [3, 3, 5], [3, 4, 6], [3, 4, 6], [4, 5, 7], [4, 5, 8],
    [4, 6, 9], [5, 7, 10], [6, 8, 11], [6, 8, 13], [7, 10, 14],
    [8, 11, 16], [9, 12, 18], [10, 13, 20], [11, 15, 23], [13, 17, 25]],
    np.int32)
_CQP = np.array(list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35,
                                   35, 36, 36, 37, 37, 37, 38, 38, 38,
                                   39, 39, 39, 39], np.int32)


# ---------------------------------------------------------------------------
# reference-plane preparation (once per DPB insertion)
# ---------------------------------------------------------------------------

@jax.jit
def make_refpack(y: jax.Array, u: jax.Array, v: jax.Array):
    """Device analog of recon.RefPack: padded full-pel plane + the three
    half-pel 6-tap FIR planes (§8.4.2.2.1) and padded chroma.

    Returns (luma4 [4, hp, wp] uint8, u_pad, v_pad)."""
    e = jnp.pad(y.astype(jnp.uint8), PAD, mode="edge")
    ei = e.astype(jnp.int32)

    def hfir(a):
        r = jnp.zeros_like(a)
        return r.at[:, 2:-3].set(a[:, 0:-5] - 5 * a[:, 1:-4]
                                 + 20 * a[:, 2:-3] + 20 * a[:, 3:-2]
                                 - 5 * a[:, 4:-1] + a[:, 5:])

    def vfir(a):
        r = jnp.zeros_like(a)
        return r.at[2:-3, :].set(a[0:-5, :] - 5 * a[1:-4, :]
                                 + 20 * a[2:-3, :] + 20 * a[3:-2, :]
                                 - 5 * a[4:-1, :] + a[5:, :])

    b1 = hfir(ei)
    b = jnp.clip((b1 + 16) >> 5, 0, 255).astype(jnp.uint8)
    h = jnp.clip((vfir(ei) + 16) >> 5, 0, 255).astype(jnp.uint8)
    j = jnp.clip((vfir(b1) + 512) >> 10, 0, 255).astype(jnp.uint8)
    luma4 = jnp.stack([e, b, h, j])
    up = jnp.pad(u.astype(jnp.uint8), PADC, mode="edge")
    vp = jnp.pad(v.astype(jnp.uint8), PADC, mode="edge")
    return luma4, up, vp


# ---------------------------------------------------------------------------
# residuals (inter MBs: AC luma + DC/AC chroma; no I16 path on device)
# ---------------------------------------------------------------------------

def _inv4(d):
    """Inverse 4x4 core transform over [..., 4, 4] int32 (§8.5.12.2)."""
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    h = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    e0 = h[..., 0, :] + h[..., 2, :]
    e1 = h[..., 0, :] - h[..., 2, :]
    e2 = (h[..., 1, :] >> 1) - h[..., 3, :]
    e3 = h[..., 1, :] + (h[..., 3, :] >> 1)
    v = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-2)
    return (v + 32) >> 6


def _residuals(coeffs, qp, chroma_qp_off, nmb, is_i16=None):
    """coeffs [nMB, 27, 16] int32 (zigzag), qp [nMB] -> (luma residual
    [nMB, 16, 4, 4], chroma residual [nMB, 2, 2, 2, 4, 4]) int32.
    is_i16 [nMB] bool folds the Intra_16x16 luma DC hadamard path
    (coeffs row 0) into block position (0, 0) pre-IDCT (§8.5.10)."""
    qp = qp.astype(jnp.int32)
    qpc = jnp.asarray(_CQP)[jnp.clip(qp + chroma_qp_off, 0, 51)]
    izz = jnp.asarray(_IZZ)
    vpos = jnp.asarray(_VPOS)

    luma = coeffs[:, 1:17, :][..., izz]                       # [n,16,16]
    lv = vpos[qp % 6][:, None, :]                             # [n,1,16]
    ldeq = (luma * lv) << (qp // 6)[:, None, None]
    if is_i16 is not None:
        h4 = jnp.asarray(np.array(
            [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1],
             [1, -1, 1, -1]], np.int32))
        dc = coeffs[:, 0, :][:, izz].reshape(nmb, 4, 4)
        fdc = jnp.einsum("ij,njk,kl->nil", h4, dc, h4)
        q64 = qp.astype(jnp.int32)
        v0 = vpos[q64 % 6][:, 0][:, None, None]
        hi = (fdc * v0) << jnp.maximum(q64 // 6 - 2, 0)[:, None, None]
        lo = (fdc * v0 + jnp.left_shift(
            jnp.int32(1), jnp.maximum(1 - q64 // 6, 0))[:, None, None]
        ) >> jnp.maximum(2 - q64 // 6, 0)[:, None, None]
        dcd = jnp.where((q64 >= 12)[:, None, None], hi, lo)   # [n,4,4]
        # block (by, bx) is coeff row 1 + by*4 + bx; its raster DC is
        # zigzag position 0
        ldeq = jnp.where(
            is_i16[:, None, None],
            ldeq.at[:, :, 0].set(dcd.reshape(nmb, 16)), ldeq)
    lres = _inv4(ldeq.reshape(nmb, 16, 4, 4))

    cdc = coeffs[:, 17:19, :4].reshape(nmb, 2, 2, 2)          # [n,pl,2,2]
    h2 = jnp.asarray(np.array([[1, 1], [1, -1]], np.int32))
    f = jnp.einsum("ij,npjk,kl->npil", h2, cdc, h2)
    v0 = vpos[qpc % 6][:, 0]
    cdcd = ((f * v0[:, None, None, None]) << (qpc // 6)[:, None, None,
                                              None]) >> 1
    cac = coeffs[:, 19:27, :][..., izz].reshape(nmb, 2, 4, 16)
    cv = vpos[qpc % 6][:, None, None, :]
    cdeq = (cac * cv) << (qpc // 6)[:, None, None, None]
    cdeq = cdeq.at[..., 0].set(cdcd.reshape(nmb, 2, 4))
    cres = _inv4(cdeq.reshape(nmb, 2, 4, 4, 4)) \
        .reshape(nmb, 2, 2, 2, 4, 4)
    return lres, cres


# ---------------------------------------------------------------------------
# inter prediction
# ---------------------------------------------------------------------------

def _mc(luma4, upad, vpad, mv, ref, mb_w, mb_h):
    """luma4 [R,4,hp,wp] uint8, upad/vpad [R,hc,wc]; mv [nMB,16,2] int32
    (x, y qpel); ref [nMB,4] -> (pred_y [nblk,4,4], pred_u [nblk,2,2],
    pred_v [nblk,2,2]) int32, blocks in MB-major 4x4-raster order."""
    nmb = mb_w * mb_h
    nblk = nmb * 16
    hp, wp = luma4.shape[2], luma4.shape[3]
    hc, wc = upad.shape[1], upad.shape[2]

    mb = jnp.arange(nmb)
    mby, mbx = mb // mb_w, mb % mb_w
    bidx = jnp.arange(16)
    ys = (mby[:, None] * 16 + (bidx // 4)[None, :] * 4).ravel()
    xs = (mbx[:, None] * 16 + (bidx % 4)[None, :] * 4).ravel()
    mvx = mv[:, :, 0].ravel().astype(jnp.int32)
    mvy = mv[:, :, 1].ravel().astype(jnp.int32)
    ridx = ref[:, ((bidx // 4) // 2) * 2 + (bidx % 4) // 2] \
        .ravel().astype(jnp.int32)
    ridx = jnp.clip(ridx, 0, luma4.shape[0] - 1)

    key = (mvy & 3) * 4 + (mvx & 3)
    qm = jnp.asarray(_QM)[key]                         # [nblk, 6]
    iy = jnp.clip(ys + (mvy >> 2) + PAD, 3, hp - 8)
    ix = jnp.clip(xs + (mvx >> 2) + PAD, 3, wp - 8)
    r4 = jnp.arange(4)
    lall = luma4.reshape(-1, hp, wp)      # [R*4, hp, wp]

    def lgather(pidx, dy, dx):
        # structured indices (batch dim + iota minor axes) so the TPU
        # backend emits row-slice loads instead of per-element fetches
        p = (ridx * 4 + pidx)[:, None, None]
        by = (iy + dy)[:, None, None] + r4[None, :, None]
        bx = (ix + dx)[:, None, None] + r4[None, None, :]
        return lall[p, by, bx].astype(jnp.int32)

    a = lgather(qm[:, 0], qm[:, 1], qm[:, 2])
    b = lgather(qm[:, 3], qm[:, 4], qm[:, 5])
    pred_y = (a + b + 1) >> 1

    # chroma: eighth-pel bilinear, 2x2 per luma 4x4 (§8.4.2.2.2)
    cys = ys // 2 + (mvy >> 3)
    cxs = xs // 2 + (mvx >> 3)
    dy = (mvy & 7)[:, None, None]
    dx = (mvx & 7)[:, None, None]
    ciy = jnp.clip(cys + PADC, 0, hc - 4)
    cix = jnp.clip(cxs + PADC, 0, wc - 4)
    r2 = jnp.arange(2)
    by = ciy[:, None, None] + r2[None, :, None]
    bx = cix[:, None, None] + r2[None, None, :]

    r3 = jnp.arange(3)
    by3 = ciy[:, None, None] + r3[None, :, None]
    bx3 = cix[:, None, None] + r3[None, None, :]

    def cgather(cpad):
        # one structured 3x3 patch gather covers all four bilinear taps
        rb = ridx[:, None, None]
        p = cpad[rb, by3, bx3].astype(jnp.int32)       # [nblk, 3, 3]
        p00 = p[:, 0:2, 0:2]
        p01 = p[:, 0:2, 1:3]
        p10 = p[:, 1:3, 0:2]
        p11 = p[:, 1:3, 1:3]
        return ((8 - dx) * (8 - dy) * p00 + dx * (8 - dy) * p01
                + (8 - dx) * dy * p10 + dx * dy * p11 + 32) >> 6

    return pred_y, cgather(upad), cgather(vpad)


# ---------------------------------------------------------------------------
# intra MB reconstruction (scattered intra-in-P), raster-order scan
# ---------------------------------------------------------------------------

# decode-order rank of the raster 4x4 positions within an MB (§6.4.3)
_ORD4 = np.array([0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15],
                 np.int32)
# decode-order list of (by, bx)
_BLK4_DEC = [divmod(int(np.flatnonzero(_ORD4 == o)[0]), 4)
             for o in range(16)]


def _pred16_branches(top, left, tl, avt, avl):
    """The four Intra_16x16 luma prediction modes (§8.3.3) from int32
    neighbor vectors top[16], left[16], scalar tl. Returns branch list
    for lax.switch."""
    xs = jnp.arange(16)

    def vert(_):
        return jnp.broadcast_to(top[None, :], (16, 16))

    def horiz(_):
        return jnp.broadcast_to(left[:, None], (16, 16))

    def dc(_):
        st, sl = top.sum(), left.sum()
        d = jnp.where(avt & avl, (st + sl + 16) >> 5,
                      jnp.where(avt, (st + 8) >> 4,
                                jnp.where(avl, (sl + 8) >> 4, 128)))
        return jnp.full((16, 16), d, jnp.int32)

    def plane(_):
        i = jnp.arange(1, 9)
        hb = jnp.where(7 - i >= 0, top[jnp.maximum(7 - i, 0)], tl)
        hsum = (i * (top[7 + i] - hb)).sum()
        vb = jnp.where(7 - i >= 0, left[jnp.maximum(7 - i, 0)], tl)
        vsum = (i * (left[7 + i] - vb)).sum()
        a = 16 * (left[15] + top[15])
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
        return jnp.clip((a + b * (xs[None, :] - 7)
                         + c * (xs[:, None] - 7) + 16) >> 5, 0, 255)

    return [vert, horiz, dc, plane]


def _pred4_branches(t, l, lt, tt):
    """The nine Intra_4x4 modes (§8.3.1.2; mirrors native/h264.cpp
    pred4). t[4], l[4], tt[8] int32 vectors, lt scalar."""
    ys, xs = jnp.mgrid[0:4, 0:4]

    def b_vert(_):
        return jnp.broadcast_to(t[None, :], (4, 4))

    def b_horiz(_):
        return jnp.broadcast_to(l[:, None], (4, 4))

    def b_dc(_):
        # availability folded by caller via mode index; full DC here
        return jnp.full((4, 4), (t.sum() + l.sum() + 4) >> 3, jnp.int32)

    def b_ddl(_):
        s = xs + ys
        gen = (tt[s] + 2 * tt[jnp.minimum(s + 1, 7)]
               + tt[jnp.minimum(s + 2, 7)] + 2) >> 2
        last = (tt[6] + 3 * tt[7] + 2) >> 2
        return jnp.where((xs == 3) & (ys == 3), last, gen)

    def b_ddr(_):
        z = xs - ys
        za = jnp.abs(z)
        tz = (t[jnp.clip(z, 0, 3)] + 2 * t[jnp.clip(z - 1, 0, 3)]
              + jnp.where(z >= 2, t[jnp.clip(z - 2, 0, 3)], lt) + 2) >> 2
        lz = (l[jnp.clip(za, 0, 3)] + 2 * l[jnp.clip(za - 1, 0, 3)]
              + jnp.where(za >= 2, l[jnp.clip(za - 2, 0, 3)], lt) + 2) >> 2
        diag = (t[0] + 2 * lt + l[0] + 2) >> 2
        return jnp.where(z > 0, tz, jnp.where(z < 0, lz, diag))

    def b_vr(_):
        z = 2 * xs - ys
        i = xs - (ys >> 1)
        even = (jnp.where(i >= 1, t[jnp.clip(i - 1, 0, 3)], lt)
                + t[jnp.clip(i, 0, 3)] + 1) >> 1
        a_od = jnp.where(i >= 2, t[jnp.clip(i - 2, 0, 3)],
                         jnp.where(i == 1, lt, l[0]))
        b_od = jnp.where(i >= 1, t[jnp.clip(i - 1, 0, 3)], lt)
        odd = (a_od + 2 * b_od + t[jnp.clip(i, 0, 3)] + 2) >> 2
        zm1 = (l[0] + 2 * lt + t[0] + 2) >> 2
        rest = (l[jnp.clip(ys - 1, 0, 3)] + 2 * l[jnp.clip(ys - 2, 0, 3)]
                + jnp.where(ys - 3 >= 0, l[jnp.clip(ys - 3, 0, 3)], lt)
                + 2) >> 2
        return jnp.where(z >= 0, jnp.where(z % 2 == 0, even, odd),
                         jnp.where(z == -1, zm1, rest))

    def b_hd(_):
        z = 2 * ys - xs
        i = ys - (xs >> 1)
        even = (jnp.where(i >= 1, l[jnp.clip(i - 1, 0, 3)], lt)
                + l[jnp.clip(i, 0, 3)] + 1) >> 1
        a_od = jnp.where(i >= 2, l[jnp.clip(i - 2, 0, 3)],
                         jnp.where(i == 1, lt, t[0]))
        b_od = jnp.where(i >= 1, l[jnp.clip(i - 1, 0, 3)], lt)
        odd = (a_od + 2 * b_od + l[jnp.clip(i, 0, 3)] + 2) >> 2
        zm1 = (t[0] + 2 * lt + l[0] + 2) >> 2
        rest = (t[jnp.clip(xs - 1, 0, 3)] + 2 * t[jnp.clip(xs - 2, 0, 3)]
                + jnp.where(xs - 3 >= 0, t[jnp.clip(xs - 3, 0, 3)], lt)
                + 2) >> 2
        return jnp.where(z >= 0, jnp.where(z % 2 == 0, even, odd),
                         jnp.where(z == -1, zm1, rest))

    def b_vl(_):
        i = xs + (ys >> 1)
        even = (tt[jnp.clip(i, 0, 7)] + tt[jnp.clip(i + 1, 0, 7)] + 1) >> 1
        odd = (tt[jnp.clip(i, 0, 7)] + 2 * tt[jnp.clip(i + 1, 0, 7)]
               + tt[jnp.clip(i + 2, 0, 7)] + 2) >> 2
        return jnp.where(ys % 2 == 0, even, odd)

    def b_hu(_):
        z = xs + 2 * ys
        i = ys + (xs >> 1)
        even = (l[jnp.clip(i, 0, 3)] + l[jnp.clip(i + 1, 0, 3)] + 1) >> 1
        odd = (l[jnp.clip(i, 0, 3)] + 2 * l[jnp.clip(i + 1, 0, 3)]
               + l[jnp.clip(i + 2, 0, 3)] + 2) >> 2
        z5 = (l[2] + 3 * l[3] + 2) >> 2
        gen = jnp.where(z % 2 == 0, even, odd)
        return jnp.where(z > 5, l[3], jnp.where(z == 5, z5, gen))

    return [b_vert, b_horiz, b_dc, b_ddl, b_ddr, b_vr, b_hd, b_vl, b_hu]


def _pred8c(ctile, cmode, avt, avl):
    """Chroma 8x8 prediction from the 9x9 context tile (row/col 0 are
    the neighbors). Mirrors native/h264.cpp pred8c."""
    top = ctile[0, 1:9]
    left = ctile[1:9, 0]
    tl = ctile[0, 0]
    xs = jnp.arange(8)

    def dcq(_):
        out = jnp.zeros((8, 8), jnp.int32)
        for qy in range(2):
            for qx in range(2):
                ts = top[qx * 4:qx * 4 + 4].sum()
                ls = left[qy * 4:qy * 4 + 4].sum()
                both = (ts + ls + 4) >> 3
                tonly = (ts + 2) >> 2
                lonly = (ls + 2) >> 2
                if qy == 0 and qx == 1:
                    val = jnp.where(avt, tonly, jnp.where(avl, lonly, 128))
                elif qy == 1 and qx == 0:
                    val = jnp.where(avl, lonly, jnp.where(avt, tonly, 128))
                else:
                    val = jnp.where(avt & avl, both,
                                    jnp.where(avt, tonly,
                                              jnp.where(avl, lonly, 128)))
                out = out.at[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4].set(val)
        return out

    def horiz(_):
        return jnp.broadcast_to(left[:, None], (8, 8))

    def vert(_):
        return jnp.broadcast_to(top[None, :], (8, 8))

    def plane(_):
        i = jnp.arange(1, 5)
        hb = jnp.where(3 - i >= 0, top[jnp.maximum(3 - i, 0)], tl)
        hsum = (i * (top[3 + i] - hb)).sum()
        vb = jnp.where(3 - i >= 0, left[jnp.maximum(3 - i, 0)], tl)
        vsum = (i * (left[3 + i] - vb)).sum()
        a = 16 * (left[7] + top[7])
        b = (17 * hsum + 16) >> 5
        c = (17 * vsum + 16) >> 5
        return jnp.clip((a + b * (xs[None, :] - 3)
                         + c * (xs[:, None] - 3) + 16) >> 5, 0, 255)

    return jax.lax.switch(jnp.clip(cmode, 0, 3),
                          [dcq, horiz, vert, plane], None)


def _intra_scan(yp, up, vp, intra_list, kind, info, i4modes, lres, cres,
                mb_w, mb_h):
    """Reconstruct the listed intra MBs in raster order over planes
    padded by 1 (top/left) and 8 (bottom/right). intra_list [cap] int32
    MB indices ascending, -1 padding. Exactly mirrors native/h264.cpp
    h264_intra_recon (bit-exactness asserted in tests)."""

    def step(carry, m):
        yp, up, vp = carry
        valid = m >= 0
        mi = jnp.maximum(m, 0)
        my, mx = mi // mb_w, mi % mb_w
        y0 = my * 16 + 1                      # padded coords
        x0 = mx * 16 + 1
        avt = my > 0
        avl = mx > 0
        k = kind[mi]
        tile = jax.lax.dynamic_slice(
            yp, (y0 - 1, x0 - 1), (17, 25)).astype(jnp.int32)
        lr = lres[mi]                          # [16, 4, 4] raster blocks

        def i16_branch(tile):
            top = tile[0, 1:17]
            left = tile[1:17, 0]
            tl = tile[0, 0]
            mode = info[mi] & 15
            pred = jax.lax.switch(jnp.clip(mode, 0, 3),
                                  _pred16_branches(top, left, tl, avt,
                                                   avl), None)
            res16 = lr.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(16, 16)
            rec = jnp.clip(pred + res16, 0, 255)
            return tile.at[1:17, 1:17].set(rec)

        def i4_branch(tile):
            for by, bx in _BLK4_DEC:
                ly, lx = 1 + by * 4, 1 + bx * 4
                t = tile[ly - 1, lx:lx + 4]
                l = tile[ly:ly + 4, lx - 1]
                lt = tile[ly - 1, lx - 1]
                # top-right availability (decode order, §8.3.1)
                if by > 0 and bx < 3:
                    av_tr_b = (_ORD4[(by - 1) * 4 + bx + 1]
                               < _ORD4[by * 4 + bx])
                    av_tr = jnp.asarray(bool(av_tr_b))
                elif by > 0:
                    av_tr = jnp.asarray(False)
                elif bx < 3:
                    av_tr = avt
                else:
                    av_tr = avt & (mx + 1 < mb_w)
                tr = tile[ly - 1, lx + 4:lx + 8]
                tt = jnp.concatenate([t, jnp.where(av_tr, tr, t[3])])
                mode = i4modes[mi, by * 4 + bx].astype(jnp.int32)
                # DC availability variants share mode index 2: compute
                # the reduced DCs and pick by availability
                pred = jax.lax.switch(jnp.clip(mode, 0, 8),
                                      _pred4_branches(t, l, lt, tt), None)
                avt_b = jnp.asarray(True) if by > 0 else avt
                avl_b = jnp.asarray(True) if bx > 0 else avl
                dc_t = jnp.full((4, 4), (t.sum() + 2) >> 2, jnp.int32)
                dc_l = jnp.full((4, 4), (l.sum() + 2) >> 2, jnp.int32)
                dc_n = jnp.full((4, 4), 128, jnp.int32)
                pred = jnp.where(
                    mode == 2,
                    jnp.where(avt_b & avl_b, pred,
                              jnp.where(avt_b, dc_t,
                                        jnp.where(avl_b, dc_l, dc_n))),
                    pred)
                rec = jnp.clip(pred + lr[by * 4 + bx], 0, 255)
                tile = tile.at[ly:ly + 4, lx:lx + 4].set(rec)
            return tile

        ntile = jax.lax.cond(k == 2, i4_branch, i16_branch, tile)
        region = jnp.where(valid, ntile[1:17, 1:17],
                           tile[1:17, 1:17]).astype(jnp.uint8)
        yp = jax.lax.dynamic_update_slice(yp, region, (y0, x0))

        # chroma
        cy0 = my * 8 + 1
        cx0 = mx * 8 + 1
        cmode = (info[mi] >> 4) & 15
        cr = cres[mi]                          # [2, 2, 2, 4, 4]

        def do_chroma(cp, pl):
            ctile = jax.lax.dynamic_slice(
                cp, (cy0 - 1, cx0 - 1), (9, 9)).astype(jnp.int32)
            pred = _pred8c(ctile, cmode, avt, avl)
            res8 = cr[pl].transpose(0, 2, 1, 3).reshape(8, 8)
            rec = jnp.clip(pred + res8, 0, 255)
            region = jnp.where(valid, rec,
                               ctile[1:9, 1:9]).astype(jnp.uint8)
            return jax.lax.dynamic_update_slice(cp, region, (cy0, cx0))

        up = do_chroma(up, 0)
        vp = do_chroma(vp, 1)
        return (yp, up, vp), None

    (yp, up, vp), _ = jax.lax.scan(step, (yp, up, vp), intra_list)
    return yp, up, vp


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "chroma_qp_off", "icap"))
def recon_p_frame(luma4, upad, vpad, coeff_idx, coeff_val, mv, ref, qp,
                  kind, info, i4modes, intra_list,
                  mb_w: int, mb_h: int, chroma_qp_off: int,
                  icap: int = 0):
    """Reconstruct one P frame (pre-deblock): parallel inter MC +
    residuals, then a raster-order scan over the (scattered) intra MBs.

    luma4 [R,4,hp,wp], upad/vpad [R,hc,wc]: DPB ref packs (L0 order).
    coeff_idx/coeff_val: sparse levels into the flat [nMB*27*16] zigzag
    tensor (padding = any index >= nMB*27*16, dropped by the scatter;
    negative padding would WRAP). intra_list [icap] int32 ascending MB
    indices of intra MBs (-1 padding; icap static, bucketed by caller).
    Returns (y, u, v) uint8 planes.
    """
    nmb = mb_w * mb_h
    W, H = mb_w * 16, mb_h * 16
    coeffs = jnp.zeros(nmb * 27 * 16, jnp.int32).at[coeff_idx].set(
        coeff_val.astype(jnp.int32), mode="drop").reshape(nmb, 27, 16)
    is_i16 = kind == 3
    lres, cres = _residuals(coeffs, qp, chroma_qp_off, nmb,
                            is_i16=is_i16 if icap else None)
    pred_y, pred_u, pred_v = _mc(luma4, upad, vpad,
                                 mv.astype(jnp.int32), ref, mb_w, mb_h)

    rec_y = jnp.clip(pred_y.reshape(nmb, 16, 4, 4) + lres, 0, 255)
    y = rec_y.reshape(mb_h, mb_w, 4, 4, 4, 4) \
        .transpose(0, 2, 4, 1, 3, 5).reshape(H, W).astype(jnp.uint8)

    # chroma: the 16 per-4x4 2x2 predictions tile each MB's 8x8 plane
    def cplane(pred, res):
        p = pred.reshape(mb_h, mb_w, 4, 4, 2, 2) \
            .transpose(0, 2, 4, 1, 3, 5).reshape(H // 2, W // 2)
        r = res.reshape(mb_h, mb_w, 2, 2, 4, 4) \
            .transpose(0, 2, 4, 1, 3, 5).reshape(H // 2, W // 2)
        return jnp.clip(p + r, 0, 255).astype(jnp.uint8)

    u = cplane(pred_u, cres[:, 0])
    v = cplane(pred_v, cres[:, 1])

    if icap:
        crespl = cres.reshape(nmb, 2, 2, 2, 4, 4)
        yp = jnp.pad(y, ((1, 8), (1, 8)))
        up = jnp.pad(u, ((1, 8), (1, 8)))
        vp = jnp.pad(v, ((1, 8), (1, 8)))
        yp, up, vp = _intra_scan(yp, up, vp, intra_list, kind, info,
                                 i4modes, lres, crespl, mb_w, mb_h)
        y = yp[1:H + 1, 1:W + 1]
        u = up[1:H // 2 + 1, 1:W // 2 + 1]
        v = vp[1:H // 2 + 1, 1:W // 2 + 1]
    return y, u, v


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "chroma_qp_off", "icap"))
def recon_p_frame_pred(pred_y, pred_u, pred_v, coeff_idx, coeff_val,
                       qp, kind, info, i4modes, intra_list,
                       mb_w: int, mb_h: int, chroma_qp_off: int,
                       icap: int = 0):
    """recon_p_frame with the inter prediction precomputed in MB-tile
    form (pred_y [nMB, 16, 16], pred_u/v [nMB, 8, 8] uint8 -- the
    mc_pallas.mc_predict output): residual add + intra scan only."""
    nmb = mb_w * mb_h
    W, H = mb_w * 16, mb_h * 16
    coeffs = jnp.zeros(nmb * 27 * 16, jnp.int32).at[coeff_idx].set(
        coeff_val.astype(jnp.int32), mode="drop").reshape(nmb, 27, 16)
    is_i16 = kind == 3
    lres, cres = _residuals(coeffs, qp, chroma_qp_off, nmb,
                            is_i16=is_i16 if icap else None)

    # MB-tile residual layouts
    lres_t = lres.reshape(nmb, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(nmb, 16, 16)
    rec_y = jnp.clip(pred_y.astype(jnp.int32) + lres_t, 0, 255)
    y = rec_y.reshape(mb_h, mb_w, 16, 16).transpose(0, 2, 1, 3) \
        .reshape(H, W).astype(jnp.uint8)

    def cplane(pred, res):
        r = res.transpose(0, 1, 3, 2, 4).reshape(nmb, 8, 8)
        rec = jnp.clip(pred.astype(jnp.int32) + r, 0, 255)
        return rec.reshape(mb_h, mb_w, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(H // 2, W // 2).astype(jnp.uint8)

    u = cplane(pred_u, cres[:, 0])
    v = cplane(pred_v, cres[:, 1])

    if icap:
        crespl = cres.reshape(nmb, 2, 2, 2, 4, 4)
        yp = jnp.pad(y, ((1, 8), (1, 8)))
        up = jnp.pad(u, ((1, 8), (1, 8)))
        vp = jnp.pad(v, ((1, 8), (1, 8)))
        yp, up, vp = _intra_scan(yp, up, vp, intra_list, kind, info,
                                 i4modes, lres, crespl, mb_w, mb_h)
        y = yp[1:H + 1, 1:W + 1]
        u = up[1:H // 2 + 1, 1:W // 2 + 1]
        v = vp[1:H // 2 + 1, 1:W // 2 + 1]
    return y, u, v


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "chroma_qp_off",
                                             "fold_i16"))
def recon_p_frame_pred_noscan(pred_y, pred_u, pred_v, coeff_idx,
                              coeff_val, qp, kind, mb_w: int, mb_h: int,
                              chroma_qp_off: int, fold_i16: bool):
    """recon_p_frame_pred without the intra scan: returns the pre-intra
    planes plus the MB-tile residual tensors (lres_t [nMB, 16, 16],
    cres_t [nMB, 2, 8, 8]) for intra_pallas.intra_scan_pallas, which
    replaces the XLA lax.scan intra pass in the shipping decode step."""
    nmb = mb_w * mb_h
    W, H = mb_w * 16, mb_h * 16
    coeffs = jnp.zeros(nmb * 27 * 16, jnp.int32).at[coeff_idx].set(
        coeff_val.astype(jnp.int32), mode="drop").reshape(nmb, 27, 16)
    lres, cres = _residuals(coeffs, qp, chroma_qp_off, nmb,
                            is_i16=(kind == 3) if fold_i16 else None)

    lres_t = lres.reshape(nmb, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(nmb, 16, 16)
    rec_y = jnp.clip(pred_y.astype(jnp.int32) + lres_t, 0, 255)
    y = rec_y.reshape(mb_h, mb_w, 16, 16).transpose(0, 2, 1, 3) \
        .reshape(H, W).astype(jnp.uint8)

    cres_t = cres.transpose(0, 1, 2, 4, 3, 5).reshape(nmb, 2, 8, 8)

    def cplane(pred, res):
        rec = jnp.clip(pred.astype(jnp.int32) + res, 0, 255)
        return rec.reshape(mb_h, mb_w, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(H // 2, W // 2).astype(jnp.uint8)

    u = cplane(pred_u, cres_t[:, 0])
    v = cplane(pred_v, cres_t[:, 1])
    return y, u, v, lres_t, cres_t


# ---------------------------------------------------------------------------
# in-loop deblocking (§8.7) as an anti-diagonal MB wavefront
# ---------------------------------------------------------------------------

def _bs_maps(coeffs, mv, ref, kind, mb_w, mb_h):
    """Per-4x4 boundary strengths. Returns (bs_v, bs_h) [H4, W4] where
    bs_v[gy, gx] is the edge LEFT of block (gy, gx) and bs_h the edge
    ABOVE it. Intra MBs force bS = 4 on MB-boundary edges and 3 inside
    (§8.7.2.1); otherwise nnz / ref / mv rules. Mirrors
    native/h264.cpp edge_bs."""
    H4, W4 = mb_h * 4, mb_w * 4
    nz = jnp.any(coeffs[:, 1:17, :] != 0, axis=-1)       # [nMB, 16]
    nz = nz.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(H4, W4)
    bidx = jnp.arange(16)
    r16 = ref[:, ((bidx // 4) // 2) * 2 + (bidx % 4) // 2]  # [nMB,16]
    rmap = r16.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(H4, W4).astype(jnp.int32)
    mvm = mv.astype(jnp.int32).reshape(mb_h, mb_w, 4, 4, 2) \
        .transpose(0, 2, 1, 3, 4).reshape(H4, W4, 2)
    isin = jnp.repeat(jnp.repeat(
        (kind >= 2).reshape(mb_h, mb_w), 4, axis=0), 4, axis=1)

    def bs_dir(nzp, nzq, rp, rq, mp, mq, inp, inq, mb_edge):
        mvbig = jnp.any(jnp.abs(mp - mq) >= 4, axis=-1)
        inter_bs = jnp.where(nzp | nzq, 2,
                             jnp.where((rp != rq) | mvbig, 1, 0))
        return jnp.where(inp | inq, jnp.where(mb_edge, 4, 3),
                         inter_bs).astype(jnp.int32)

    mbe_v = (jnp.arange(1, W4) % 4 == 0)[None, :]
    mbe_h = (jnp.arange(1, H4) % 4 == 0)[:, None]
    bs_v = jnp.zeros((H4, W4), jnp.int32)
    bs_v = bs_v.at[:, 1:].set(bs_dir(nz[:, :-1], nz[:, 1:],
                                     rmap[:, :-1], rmap[:, 1:],
                                     mvm[:, :-1], mvm[:, 1:],
                                     isin[:, :-1], isin[:, 1:], mbe_v))
    bs_h = jnp.zeros((H4, W4), jnp.int32)
    bs_h = bs_h.at[1:, :].set(bs_dir(nz[:-1, :], nz[1:, :],
                                     rmap[:-1, :], rmap[1:, :],
                                     mvm[:-1, :], mvm[1:, :],
                                     isin[:-1, :], isin[1:, :], mbe_h))
    return bs_v, bs_h


def _edge_params(qp, mb_w, mb_h, chroma_qp_off, alpha_off, beta_off):
    """Per-4x4-edge alpha/beta/tc0-index maps for both directions, luma
    and chroma. qp [nMB]. Returns dict of [H4, W4] index arrays (into
    ALPHA/BETA/TC0), qp-averaged across MB boundaries."""
    H4, W4 = mb_h * 4, mb_w * 4
    qpm = qp.astype(jnp.int32).reshape(mb_h, mb_w)
    cqm = jnp.asarray(_CQP)[jnp.clip(qpm + chroma_qp_off, 0, 51)]

    def expand(m):                     # [mb_h, mb_w] -> [H4, W4]
        return jnp.repeat(jnp.repeat(m, 4, axis=0), 4, axis=1)

    def maps(qmb):
        q = expand(qmb)
        # vertical: edge left of (gy,gx); MB edge when gx%4==0 -> avg
        # with left MB's qp
        ql = jnp.concatenate([q[:, :4], q[:, :-4]], axis=1)
        gx = jnp.arange(W4)[None, :]
        qv = jnp.where(gx % 4 == 0, (ql + q + 1) >> 1, q)
        qt = jnp.concatenate([q[:4, :], q[:-4, :]], axis=0)
        gy = jnp.arange(H4)[:, None]
        qh = jnp.where(gy % 4 == 0, (qt + q + 1) >> 1, q)
        return (jnp.clip(qv + alpha_off, 0, 51),
                jnp.clip(qv + beta_off, 0, 51),
                jnp.clip(qh + alpha_off, 0, 51),
                jnp.clip(qh + beta_off, 0, 51))

    lav, lbv, lah, lbh = maps(qpm)
    cav, cbv, cah, cbh = maps(cqm)
    return {"lav": lav, "lbv": lbv, "lah": lah, "lbh": lbh,
            "cav": cav, "cbv": cbv, "cah": cah, "cbh": cbh}


def _filt_luma(patch, bs, ia, ib):
    """Filter one luma edge: patch [..., 8] = (p3 p2 p1 p0 q0 q1 q2 q3)
    int32, bS in {0..4} (normal + strong filters), alpha/beta table
    indices broadcastable to patch[..., 0]. Returns patch'."""
    alpha = jnp.asarray(_ALPHA)[ia]
    beta = jnp.asarray(_BETA)[ib]
    tc0 = jnp.asarray(_TC0)[ia, jnp.clip(bs - 1, 0, 2)]
    p3, p2, p1, p0 = (patch[..., i] for i in range(4))
    q0, q1, q2, q3 = (patch[..., i] for i in range(4, 8))
    fmask = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
             & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    # normal filter (bS < 4)
    tc = tc0 + ap + aq
    delta = jnp.clip((((q0 - p0) * 4) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)
    p1n = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1,
                        -tc0, tc0)
    q1n = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1,
                        -tc0, tc0)
    # strong filter (bS == 4, §8.7.2.4)
    close = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = ap & close
    sq = aq & close
    p0s = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    p1s = (p2 + p1 + p0 + q0 + 2) >> 2
    p2s = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    q0s = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    q1s = (q2 + q1 + q0 + p0 + 2) >> 2
    q2s = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    bs4 = bs == 4
    out = patch
    out = out.at[..., 3].set(jnp.where(
        fmask, jnp.where(bs4, p0s, p0n), p0))
    out = out.at[..., 4].set(jnp.where(
        fmask, jnp.where(bs4, q0s, q0n), q0))
    out = out.at[..., 2].set(jnp.where(
        fmask, jnp.where(bs4, jnp.where(sp, p1s, p1),
                         jnp.where(ap, p1n, p1)), p1))
    out = out.at[..., 5].set(jnp.where(
        fmask, jnp.where(bs4, jnp.where(sq, q1s, q1),
                         jnp.where(aq, q1n, q1)), q1))
    out = out.at[..., 1].set(jnp.where(
        fmask & bs4 & sp, p2s, p2))
    out = out.at[..., 6].set(jnp.where(
        fmask & bs4 & sq, q2s, q2))
    return out


def _filt_chroma(patch, bs, ia, ib):
    """patch [..., 4] = (p1 p0 q0 q1) int32; chroma filter incl. the
    bS == 4 strong form."""
    alpha = jnp.asarray(_ALPHA)[ia]
    beta = jnp.asarray(_BETA)[ib]
    tc0 = jnp.asarray(_TC0)[ia, jnp.clip(bs - 1, 0, 2)]
    p1, p0, q0, q1 = (patch[..., i] for i in range(4))
    fmask = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
             & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) * 4) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)
    p0s = (2 * p1 + p0 + q1 + 2) >> 2
    q0s = (2 * q1 + q0 + p1 + 2) >> 2
    bs4 = bs == 4
    out = patch
    out = out.at[..., 1].set(jnp.where(
        fmask, jnp.where(bs4, p0s, p0n), p0))
    out = out.at[..., 2].set(jnp.where(
        fmask, jnp.where(bs4, q0s, q0n), q0))
    return out


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "chroma_qp_off",
                                             "alpha_off", "beta_off"))
def deblock_frame(y, u, v, coeff_idx, coeff_val, mv, ref, qp, kind,
                  mb_w: int, mb_h: int, chroma_qp_off: int = 0,
                  alpha_off: int = 0, beta_off: int = 0):
    """In-loop deblock of a P frame, MB-wavefront ordered.

    Spec order is MB raster with vertical edges before horizontal
    (§8.7); an MB depends on its left, top and top-right neighbors'
    filtered output, so diagonals t = mx + 2*my are independent."""
    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    coeffs = jnp.zeros(nmb * 27 * 16, jnp.int32).at[coeff_idx].set(
        coeff_val.astype(jnp.int32), mode="drop").reshape(nmb, 27, 16)
    bs_v, bs_h = _bs_maps(coeffs, mv, ref, kind, mb_w, mb_h)
    ep = _edge_params(qp, mb_w, mb_h, chroma_qp_off, alpha_off, beta_off)

    nd = mb_h                               # max MBs per diagonal
    myv = jnp.arange(nd)
    r16 = jnp.arange(16)
    r8 = jnp.arange(8)
    r4 = jnp.arange(4)

    def step(carry, t):
        y, u, v = carry
        mxv = t - 2 * myv
        valid = (mxv >= 0) & (mxv < mb_w)
        # inactive lanes are redirected to a scratch MB row below the
        # frame (planes are padded): they round-trip scratch pixels
        # unchanged, so no lane ever writes the same pixels as a valid
        # lane -- scatter duplicate-index ordering never decides
        # correctness
        mx = jnp.clip(mxv, 0, mb_w - 1)
        my = jnp.where(valid, myv, mb_h)

        # ---- luma vertical edges e = 0..3 (sequential) ----
        rows = (my * 16)[:, None] + r16[None, :]            # [nd, 16]
        for e in range(4):
            gx4 = mx * 4 + e                                 # block col
            cols = (gx4 * 4 - 4)[:, None] + r8[None, :]      # [nd, 8]
            cols = jnp.clip(cols, 0, W - 1)                  # e=0,mx=0
            patch = y[rows[:, :, None], cols[:, None, :]] \
                .astype(jnp.int32)                           # [nd,16,8]
            gy4 = (my * 4)[:, None] + r4[None, :]
            bs = bs_v[gy4, gx4[:, None]]                     # [nd, 4]
            ia = ep["lav"][gy4, gx4[:, None]]
            ib = ep["lbv"][gy4, gx4[:, None]]
            rep = lambda a: jnp.repeat(a, 4, axis=1)         # noqa: E731
            newp = _filt_luma(patch, rep(bs), rep(ia), rep(ib))
            newp = jnp.where(valid[:, None, None], newp, patch)
            y = y.at[rows[:, :, None], cols[:, None, :]].set(
                newp.astype(jnp.uint8))
        # ---- luma horizontal edges ----
        cols = (mx * 16)[:, None] + r16[None, :]
        for e in range(4):
            gy4 = my * 4 + e
            rws = (gy4 * 4 - 4)[:, None] + r8[None, :]
            rws = jnp.clip(rws, 0, H + 19)   # padded: scratch row band
            patch = y[rws[:, :, None], cols[:, None, :]] \
                .transpose(0, 2, 1).astype(jnp.int32)        # [nd,16,8]
            gx4 = (mx * 4)[:, None] + r4[None, :]
            bs = bs_h[gy4[:, None], gx4]
            ia = ep["lah"][gy4[:, None], gx4]
            ib = ep["lbh"][gy4[:, None], gx4]
            rep = lambda a: jnp.repeat(a, 4, axis=1)         # noqa: E731
            newp = _filt_luma(patch, rep(bs), rep(ia), rep(ib))
            newp = jnp.where(valid[:, None, None], newp, patch)
            y = y.at[rws[:, :, None], cols[:, None, :]].set(
                newp.transpose(0, 2, 1).astype(jnp.uint8))
        # ---- chroma edges (u, v) ----
        crows = (my * 8)[:, None] + r8[None, :]
        ccols = (mx * 8)[:, None] + r8[None, :]
        for pl in range(2):
            c = u if pl == 0 else v
            # vertical e in {0, 1} -> luma block col mx*4 + 2e
            for e in range(2):
                gx4 = mx * 4 + 2 * e
                cx = gx4 * 2                                  # chroma col
                cls = (cx - 2)[:, None] + r4[None, :]
                cls = jnp.clip(cls, 0, W // 2 - 1)
                patch = c[crows[:, :, None], cls[:, None, :]] \
                    .astype(jnp.int32)                        # [nd,8,4]
                gy4 = (my * 4)[:, None] + r4[None, :]
                bs = bs_v[gy4, gx4[:, None]]                  # [nd,4]
                ia = ep["cav"][gy4, gx4[:, None]]
                ib = ep["cbv"][gy4, gx4[:, None]]
                rep2 = lambda a: jnp.repeat(a, 2, axis=1)     # noqa: E731
                newp = _filt_chroma(patch, rep2(bs), rep2(ia), rep2(ib))
                newp = jnp.where(valid[:, None, None], newp, patch)
                c = c.at[crows[:, :, None], cls[:, None, :]].set(
                    newp.astype(jnp.uint8))
            # horizontal e in {0, 1}
            for e in range(2):
                gy4 = my * 4 + 2 * e
                cy = gy4 * 2
                rws = (cy - 2)[:, None] + r4[None, :]
                rws = jnp.clip(rws, 0, H // 2 + 11)
                patch = c[rws[:, :, None], ccols[:, None, :]] \
                    .transpose(0, 2, 1).astype(jnp.int32)     # [nd,8,4]
                gx4 = (mx * 4)[:, None] + r4[None, :]
                bs = bs_h[gy4[:, None], gx4]
                ia = ep["cah"][gy4[:, None], gx4]
                ib = ep["cbh"][gy4[:, None], gx4]
                rep2 = lambda a: jnp.repeat(a, 2, axis=1)     # noqa: E731
                newp = _filt_chroma(patch, rep2(bs), rep2(ia), rep2(ib))
                newp = jnp.where(valid[:, None, None], newp, patch)
                c = c.at[rws[:, :, None], ccols[:, None, :]].set(
                    newp.transpose(0, 2, 1).astype(jnp.uint8))
            if pl == 0:
                u = c
            else:
                v = c
        return (y, u, v), None

    nsteps = mb_w + 2 * mb_h - 2
    y = jnp.pad(y, ((0, 20), (0, 0)))        # scratch MB row for
    u = jnp.pad(u, ((0, 12), (0, 0)))        # inactive wavefront lanes
    v = jnp.pad(v, ((0, 12), (0, 0)))
    (y, u, v), _ = jax.lax.scan(step, (y, u, v),
                                jnp.arange(nsteps))
    return y[:H], u[:H // 2], v[:H // 2]
