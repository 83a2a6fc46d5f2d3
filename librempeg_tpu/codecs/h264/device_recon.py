"""On-device H.264 P-frame reconstruction + in-loop deblocking.

The decode side of the flagship transcode keeps the DPB in device HBM:
per frame the host uploads only the entropy tensors (sparse transform
coefficients + the motion field, a few hundred KB) and every pixel
operation -- dequant, inverse transform, quarter-pel MC, deblocking --
runs inside one jitted XLA program. Nothing pixel-sized ever crosses
the host<->device link, which on a tunneled TPU is the decode
bottleneck by an order of magnitude.

Scope: all-inter frames (P slices whose MBs are inter/P_SKIP). Frames
containing intra MBs (IDR refreshes, intra-in-P) take the exact host
path (native/h264.cpp) and upload their pixels once -- amortized over
the GOP. Everything here is bit-exact with the host reconstruction
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


def _residuals(coeffs, qp, chroma_qp_off, nmb):
    """coeffs [nMB, 27, 16] int32 (zigzag), qp [nMB] -> (luma residual
    [nMB, 16, 4, 4], chroma residual [nMB, 2, 2, 2, 4, 4]) int32."""
    qp = qp.astype(jnp.int32)
    qpc = jnp.asarray(_CQP)[jnp.clip(qp + chroma_qp_off, 0, 51)]
    izz = jnp.asarray(_IZZ)
    vpos = jnp.asarray(_VPOS)

    luma = coeffs[:, 1:17, :][..., izz]                       # [n,16,16]
    lv = vpos[qp % 6][:, None, :]                             # [n,1,16]
    ldeq = (luma * lv) << (qp // 6)[:, None, None]
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


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "chroma_qp_off"))
def recon_p_frame(luma4, upad, vpad, coeff_idx, coeff_val, mv, ref, qp,
                  mb_w: int, mb_h: int, chroma_qp_off: int):
    """Reconstruct one all-inter frame (pre-deblock).

    luma4 [R,4,hp,wp], upad/vpad [R,hc,wc]: DPB ref packs (L0 order).
    coeff_idx/coeff_val: sparse levels into the flat [nMB*27*16] zigzag
    tensor (idx -1 = padding). Returns (y, u, v) uint8 planes.
    """
    nmb = mb_w * mb_h
    W, H = mb_w * 16, mb_h * 16
    coeffs = jnp.zeros(nmb * 27 * 16, jnp.int32).at[coeff_idx].set(
        coeff_val.astype(jnp.int32), mode="drop").reshape(nmb, 27, 16)
    lres, cres = _residuals(coeffs, qp, chroma_qp_off, nmb)
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
    return y, u, v


# ---------------------------------------------------------------------------
# in-loop deblocking (§8.7) as an anti-diagonal MB wavefront
# ---------------------------------------------------------------------------

def _bs_maps(coeffs, mv, ref, mb_w, mb_h):
    """Per-4x4 boundary strengths for all-inter frames (bS in {0,1,2};
    intra frames never reach the device path). Returns (bs_v, bs_h)
    [H4, W4] where bs_v[gy, gx] is the edge LEFT of block (gy, gx) and
    bs_h the edge ABOVE it. Mirrors native/h264.cpp edge_bs."""
    nmb = mb_w * mb_h
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

    def bs_dir(nzp, nzq, rp, rq, mp, mq):
        mvbig = jnp.any(jnp.abs(mp - mq) >= 4, axis=-1)
        return jnp.where(nzp | nzq, 2,
                         jnp.where((rp != rq) | mvbig, 1, 0)) \
            .astype(jnp.int32)

    bs_v = jnp.zeros((H4, W4), jnp.int32)
    bs_v = bs_v.at[:, 1:].set(bs_dir(nz[:, :-1], nz[:, 1:],
                                     rmap[:, :-1], rmap[:, 1:],
                                     mvm[:, :-1], mvm[:, 1:]))
    bs_h = jnp.zeros((H4, W4), jnp.int32)
    bs_h = bs_h.at[1:, :].set(bs_dir(nz[:-1, :], nz[1:, :],
                                     rmap[:-1, :], rmap[1:, :],
                                     mvm[:-1, :], mvm[1:, :]))
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
    int32, bS in {0,1,2} (bS<4 math only -- all-inter frames), alpha/
    beta table indices broadcastable to patch[..., 0]. Returns patch'."""
    alpha = jnp.asarray(_ALPHA)[ia]
    beta = jnp.asarray(_BETA)[ib]
    tc0 = jnp.asarray(_TC0)[ia, jnp.maximum(bs - 1, 0)]
    p2, p1, p0 = patch[..., 1], patch[..., 2], patch[..., 3]
    q0, q1, q2 = patch[..., 4], patch[..., 5], patch[..., 6]
    fmask = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
             & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap + aq
    delta = jnp.clip((((q0 - p0) * 4) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0n = jnp.clip(p0 + delta, 0, 255)
    q0n = jnp.clip(q0 - delta, 0, 255)
    p1n = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1,
                        -tc0, tc0)
    q1n = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1,
                        -tc0, tc0)
    out = patch
    out = out.at[..., 3].set(jnp.where(fmask, p0n, p0))
    out = out.at[..., 4].set(jnp.where(fmask, q0n, q0))
    out = out.at[..., 2].set(jnp.where(fmask & ap, p1n, p1))
    out = out.at[..., 5].set(jnp.where(fmask & aq, q1n, q1))
    return out


def _filt_chroma(patch, bs, ia, ib):
    """patch [..., 4] = (p1 p0 q0 q1) int32; bS<4 chroma filter."""
    alpha = jnp.asarray(_ALPHA)[ia]
    beta = jnp.asarray(_BETA)[ib]
    tc0 = jnp.asarray(_TC0)[ia, jnp.maximum(bs - 1, 0)]
    p1, p0, q0, q1 = (patch[..., i] for i in range(4))
    fmask = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
             & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) * 4) + (p1 - q1) + 4) >> 3, -tc, tc)
    out = patch
    out = out.at[..., 1].set(jnp.where(fmask, jnp.clip(p0 + delta, 0, 255),
                                       p0))
    out = out.at[..., 2].set(jnp.where(fmask, jnp.clip(q0 - delta, 0, 255),
                                       q0))
    return out


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "chroma_qp_off",
                                             "alpha_off", "beta_off"))
def deblock_frame(y, u, v, coeff_idx, coeff_val, mv, ref, qp,
                  mb_w: int, mb_h: int, chroma_qp_off: int = 0,
                  alpha_off: int = 0, beta_off: int = 0):
    """In-loop deblock of an all-inter frame, MB-wavefront ordered.

    Spec order is MB raster with vertical edges before horizontal
    (§8.7); an MB depends on its left, top and top-right neighbors'
    filtered output, so diagonals t = mx + 2*my are independent."""
    nmb = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    coeffs = jnp.zeros(nmb * 27 * 16, jnp.int32).at[coeff_idx].set(
        coeff_val.astype(jnp.int32), mode="drop").reshape(nmb, 27, 16)
    bs_v, bs_h = _bs_maps(coeffs, mv, ref, mb_w, mb_h)
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
        mx = jnp.where(valid, mxv, 0)
        my = jnp.where(valid, myv, 0)

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
            rws = jnp.clip(rws, 0, H - 1)
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
                rws = jnp.clip(rws, 0, H // 2 - 1)
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
    (y, u, v), _ = jax.lax.scan(step, (y, u, v),
                                jnp.arange(nsteps))
    return y, u, v
