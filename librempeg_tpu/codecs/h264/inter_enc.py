"""H.264 P-slice encoder: motion search, mode decision, CAVLC packing,
spec-exact reconstruction.

The reconstruction path reuses the decoder's integer primitives
(codecs/h264/recon.py), so every stream this encoder emits doubles as a
decoder test vector: tests assert our decoder's output is bit-exact
with both this encoder's recon and the reference decoder's output.

Behavioral reference (not a translation): the mpegvideo-enc style
host loop in /root/reference/libavcodec/mpegvideo_enc.c adapted to
H.264 syntax (§7.3.5, §8.4.1 mv prediction, §9.2 CAVLC); qpel search
follows the decode-side interpolation exactly.
"""
from __future__ import annotations

import numpy as np

from librempeg_tpu.codecs.flac.bitio import BitWriterMSB
from librempeg_tpu.codecs.h264 import intra as I
from librempeg_tpu.codecs.h264 import recon as R
from librempeg_tpu.codecs.h264.cavlc import ZIGZAG4, write_residual
from librempeg_tpu.codecs.h264.intra import (
    _BLK4,
    _NcCtx,
    _rbsp_to_nal,
    _write_se,
    _write_ue,
)

# inverse of the inter CBP mapping (Table 9-4): cbp -> golomb code
_INTER_CBP_TO_GOLOMB = np.zeros(48, np.int32)
_GOLOMB_TO_INTER_CBP = [
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41]
for _g, _c in enumerate(_GOLOMB_TO_INTER_CBP):
    _INTER_CBP_TO_GOLOMB[_c] = _g


class MotionCtx:
    """Per-frame mv/ref grids mirroring the decoder's prediction state
    (native/h264.cpp SliceCtx): refg -2 undecoded, -1 intra, >=0 ref."""

    def __init__(self, mb_w: int, mb_h: int):
        self.w4, self.h4 = mb_w * 4, mb_h * 4
        self.mvg = np.zeros((self.h4, self.w4, 2), np.int32)
        self.refg = np.full((self.h4, self.w4), -2, np.int32)

    def fetch(self, x4: int, y4: int):
        """(available, ref, mvx, mvy); intra -> (True, -1, 0, 0)."""
        if x4 < 0 or y4 < 0 or x4 >= self.w4 or y4 >= self.h4:
            return False, -1, 0, 0
        r = int(self.refg[y4, x4])
        if r == -2:
            return False, -1, 0, 0
        if r < 0:
            return True, -1, 0, 0
        return True, r, int(self.mvg[y4, x4, 0]), int(self.mvg[y4, x4, 1])

    def predict(self, x4, y4, w4p, h4p, ref, part_kind=0):
        aA, rA, xA, yA = self.fetch(x4 - 1, y4)
        aB, rB, xB, yB = self.fetch(x4, y4 - 1)
        aC, rC, xC, yC = self.fetch(x4 + w4p, y4 - 1)
        if not aC:
            aC, rC, xC, yC = self.fetch(x4 - 1, y4 - 1)
        if part_kind == 1 and aB and rB == ref:
            return xB, yB
        if part_kind == 2 and aA and rA == ref:
            return xA, yA
        if part_kind == 3 and aA and rA == ref:
            return xA, yA
        if part_kind == 4 and aC and rC == ref:
            return xC, yC
        if not aB and not aC and aA:
            return xA, yA
        eA = aA and rA == ref
        eB = aB and rB == ref
        eC = aC and rC == ref
        if eA and not eB and not eC:
            return xA, yA
        if eB and not eA and not eC:
            return xB, yB
        if eC and not eA and not eB:
            return xC, yC

        def med(a, b, c):
            return a + b + c - max(a, b, c) - min(a, b, c)

        return med(xA, xB, xC), med(yA, yB, yC)

    def skip_mv(self, mx: int, my: int):
        """P_SKIP mv derivation (§8.4.1.1)."""
        x4, y4 = mx * 4, my * 4
        aA, rA, xA, yA = self.fetch(x4 - 1, y4)
        aB, rB, xB, yB = self.fetch(x4, y4 - 1)
        if not aA or not aB or (rA == 0 and xA == 0 and yA == 0) \
                or (rB == 0 and xB == 0 and yB == 0):
            return 0, 0
        return self.predict(x4, y4, 4, 4, 0)

    def fill(self, x4, y4, w4p, h4p, ref, mvx, mvy):
        self.refg[y4:y4 + h4p, x4:x4 + w4p] = ref
        self.mvg[y4:y4 + h4p, x4:x4 + w4p, 0] = mvx
        self.mvg[y4:y4 + h4p, x4:x4 + w4p, 1] = mvy

    def fill_intra(self, mx, my):
        self.refg[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1
        self.mvg[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0


def _quant4(w, qp, intra):
    return I.quant4(w, qp, intra=intra)


def _sad(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())


def _int_search(epad, src, y, x, pred_mv, sr):
    """Full integer-pel search in a +-sr window around the integer part
    of pred_mv; returns (mvx, mvy, SAD) in qpel units. Window candidates
    are clamped so the referenced block (plus the 3-sample interpolation
    margin and one pel of subpel refinement) stays strictly inside the
    PAD-replicated plane — coordinate clipping never engages, keeping the
    encoder's MC identical to the decoder's per-4x4 MC."""
    p = R.PAD
    hh = epad.shape[0] - 2 * p
    ww = epad.shape[1] - 2 * p
    lo_y, hi_y = -(p - 8), hh - 16 + (p - 8)
    lo_x, hi_x = -(p - 8), ww - 16 + (p - 8)
    cy = int(np.clip(y + (pred_mv[1] >> 2), lo_y + sr, hi_y - sr))
    cx = int(np.clip(x + (pred_mv[0] >> 2), lo_x + sr, hi_x - sr))
    region = epad[cy + p - sr:cy + p + sr + 16,
                  cx + p - sr:cx + p + sr + 16]
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(region, (16, 16))          # [2sr+1,2sr+1,..]
    sads = wins.astype(np.int32)
    sads = np.abs(sads - src.astype(np.int32)[None, None]).sum(axis=(2, 3))
    iy, ix = np.unravel_index(np.argmin(sads), sads.shape)
    best = int(sads[iy, ix])
    mvy = (cy - y + int(iy) - sr) * 4
    mvx = (cx - x + int(ix) - sr) * 4
    return mvx, mvy, best


def _subpel_refine(planes, src, y, x, mvx, mvy, best, step):
    """Evaluate the 8 neighbors at qpel distance `step`; keep the best
    (ties broken deterministically toward smaller |mv|)."""
    cands = [(best, abs(mvx) + abs(mvy), mvx, mvy)]
    for dy in (-step, 0, step):
        for dx in (-step, 0, step):
            if dx == 0 and dy == 0:
                continue
            pred = R.mc_luma_block(planes, y, x, mvx + dx, mvy + dy)
            cands.append((_sad(pred, src), abs(mvx + dx) + abs(mvy + dy),
                          mvx + dx, mvy + dy))
    s, _, mx, my2 = min(cands)
    return mx, my2, s


class PFrameEncoder:
    """Encodes one P frame; owns the per-frame metadata arrays needed
    for the in-loop deblock (shared layout with the decoder)."""

    def __init__(self, mb_w, mb_h, qp, chroma_qp_off=0, search_range=8,
                 partitions=False):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.qp = qp
        self.qpc = int(R.CHROMA_QP[np.clip(qp + chroma_qp_off, 0, 51)])
        self.sr = search_range
        self.partitions = partitions    # exercise 16x8/8x16/8x8 shapes
        nmb = mb_w * mb_h
        self.kind = np.full(nmb, -1, np.int32)
        self.qp_arr = np.full(nmb, qp, np.int32)
        self.mv_arr = np.zeros((nmb, 16, 2), np.int16)
        self.ref_arr = np.full((nmb, 4), -1, np.int8)
        self.ncoef = np.zeros((nmb, 27), np.int16)

    def encode(self, y, u, v, ref_planes, frame_num):
        """ref_planes = (y,u,v) deblocked recon of the reference.
        Returns (nal_bytes, (recon_y, recon_u, recon_v) pre-deblock)."""
        mb_w, mb_h = self.mb_w, self.mb_h
        qp, qpc = self.qp, self.qpc
        ry, ru, rv = (p.astype(np.int64) for p in
                      (np.zeros_like(y), np.zeros_like(u),
                       np.zeros_like(v)))
        planes = R.qpel_planes(np.asarray(ref_planes[0]))
        upad = R.pad_chroma(np.asarray(ref_planes[1]))
        vpad = R.pad_chroma(np.asarray(ref_planes[2]))

        bw = BitWriterMSB()
        # slice header: P, deblocking per self.deblock flag
        _write_ue(bw, 0)                     # first_mb
        _write_ue(bw, 5)                     # slice_type P (all slices)
        _write_ue(bw, 0)                     # pps id
        bw.write(frame_num % 16, 4)          # frame_num
        bw.write((frame_num * 2) % 16, 4)    # poc lsb
        bw.write(0, 1)                       # num_ref_idx_override
        bw.write(0, 1)                       # ref_pic_list_modification
        bw.write(0, 1)                       # adaptive_ref_pic_marking
        _write_se(bw, qp - 26)               # slice_qp_delta
        _write_ue(bw, 0)                     # disable_deblocking_idc = 0
        _write_se(bw, 0)                     # alpha offset
        _write_se(bw, 0)                     # beta offset

        mc = MotionCtx(mb_w, mb_h)
        ncY = _NcCtx(mb_h * 4, mb_w * 4)
        ncU = _NcCtx(mb_h * 2, mb_w * 2)
        ncV = _NcCtx(mb_h * 2, mb_w * 2)
        skip_run = 0
        for my in range(mb_h):
            for mx in range(mb_w):
                skip_run = self._encode_mb(
                    bw, y, u, v, ry, ru, rv, my, mx, planes, upad, vpad,
                    mc, ncY, ncU, ncV, skip_run)
        if skip_run:                          # trailing skips
            _write_ue(bw, skip_run)
        bw.write(1, 1)
        bw.align()
        nal = _rbsp_to_nal(bw.bytes(), 1, 2)  # non-IDR slice, ref
        return nal, (ry.astype(np.uint8), ru.astype(np.uint8),
                     rv.astype(np.uint8))

    # -- per-MB ---------------------------------------------------------

    def _encode_mb(self, bw, y, u, v, ry, ru, rv, my, mx, planes,
                   upad, vpad, mc, ncY, ncU, ncV, skip_run):
        qp, qpc = self.qp, self.qpc
        mb = my * self.mb_w + mx
        src = y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
        x4, y4 = mx * 4, my * 4

        # --- motion search (16x16, ref 0) ---
        pmv = mc.predict(x4, y4, 4, 4, 0)
        mvx, mvy, best = _int_search(planes[0], src, my * 16, mx * 16,
                                     pmv, self.sr)
        mvx, mvy, best = _subpel_refine(planes, src, my * 16, mx * 16,
                                        mvx, mvy, best, 2)
        mvx, mvy, best = _subpel_refine(planes, src, my * 16, mx * 16,
                                        mvx, mvy, best, 1)

        # --- intra fallback decision (SAD on I16 DC mode as proxy) ---
        intra_sad = None
        for mode in I._modes16_available(my, mx):
            p16 = I._pred16(ry, my, mx, mode)
            s = _sad(p16, src)
            if intra_sad is None or s < intra_sad:
                intra_sad, intra_mode = s, mode
        use_intra = intra_sad + 64 < best

        if use_intra:
            if skip_run or True:
                _write_ue(bw, skip_run)       # mb_skip_run before any MB
            skip_run = 0
            self._encode_intra16(bw, y, u, v, ry, ru, rv, my, mx,
                                 intra_mode, ncY, ncU, ncV)
            mc.fill_intra(mx, my)
            self.kind[mb] = 3
            self.ref_arr[mb] = -1
            return skip_run

        # --- inter: transform/quant the residual ---
        pred = R.mc_luma_block(planes, my * 16, mx * 16, mvx, mvy)
        resid = src.astype(np.int64) - pred
        w16 = np.zeros((4, 4, 4, 4), np.int64)
        lev = np.zeros((4, 4, 4, 4), np.int64)
        for by in range(4):
            for bx in range(4):
                w16[by, bx] = I.fwd4(resid[by * 4:by * 4 + 4,
                                           bx * 4:bx * 4 + 4])
                lev[by, bx] = _quant4(w16[by, bx], qp, intra=False)
        cbp_luma = 0
        for i8 in range(4):
            blks = [lev[(i8 // 2) * 2 + a, (i8 % 2) * 2 + b]
                    for a in range(2) for b in range(2)]
            if any(np.any(b) for b in blks):
                cbp_luma |= 1 << i8

        predu = R.mc_chroma_block(upad, my * 8, mx * 8, mvx, mvy)
        predv = R.mc_chroma_block(vpad, my * 8, mx * 8, mvx, mvy)
        c_lev, c_dc = {}, {}
        for name, plane, predc in (("u", u, predu), ("v", v, predv)):
            srcc = plane[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
            residc = srcc.astype(np.int64) - predc
            wc = np.zeros((2, 2, 4, 4), np.int64)
            for by in range(2):
                for bx in range(2):
                    wc[by, bx] = I.fwd4(residc[by * 4:by * 4 + 4,
                                               bx * 4:bx * 4 + 4])
            cdc = I._H2 @ wc[:, :, 0, 0] @ I._H2
            c_dc[name] = _quant_dc_inter(cdc, qpc)
            lv = np.zeros((2, 2, 4, 4), np.int64)
            for by in range(2):
                for bx in range(2):
                    lv[by, bx] = _quant4(wc[by, bx], qpc, intra=False)
                    lv[by, bx, 0, 0] = 0
            c_lev[name] = lv
        has_cdc = bool(np.any(c_dc["u"]) or np.any(c_dc["v"]))
        has_cac = bool(np.any(c_lev["u"]) or np.any(c_lev["v"]))
        cbp_chroma = 2 if has_cac else (1 if has_cdc else 0)
        cbp = cbp_luma | (cbp_chroma << 4)

        # --- skip? ---
        smx, smy = mc.skip_mv(mx, my)
        if cbp == 0 and (mvx, mvy) == (smx, smy):
            mc.fill(x4, y4, 4, 4, 0, mvx, mvy)
            self._recon_inter(ry, ru, rv, my, mx, pred, predu, predv,
                              None, None, None)
            for by in range(4):
                for bx in range(4):
                    ncY.set(y4 + by, x4 + bx, 0)
            for by in range(2):
                for bx in range(2):
                    ncU.set(my * 2 + by, mx * 2 + bx, 0)
                    ncV.set(my * 2 + by, mx * 2 + bx, 0)
            self.kind[mb] = 0
            self.ref_arr[mb] = 0
            self.mv_arr[mb, :, 0] = mvx
            self.mv_arr[mb, :, 1] = mvy
            return skip_run + 1

        # --- emit P_L0_16x16 ---
        _write_ue(bw, skip_run)
        skip_run = 0
        _write_ue(bw, 0)                      # mb_type P_L0_16x16
        # (num_ref_idx_l0 == 1: no ref_idx bits)
        _write_se(bw, mvx - pmv[0])
        _write_se(bw, mvy - pmv[1])
        _write_ue(bw, int(_INTER_CBP_TO_GOLOMB[cbp]))
        if cbp:
            _write_se(bw, 0)                  # mb_qp_delta
        mc.fill(x4, y4, 4, 4, 0, mvx, mvy)
        self.kind[mb] = 1
        self.ref_arr[mb] = 0
        self.mv_arr[mb, :, 0] = mvx
        self.mv_arr[mb, :, 1] = mvy

        # residuals: luma 4x4 (full 16 coeffs) in scan order, gated by cbp
        for blk in range(16):
            by, bx = _BLK4[blk]
            gy, gx = y4 + by, x4 + bx
            if (cbp_luma >> (blk >> 2)) & 1:
                nc = ncY.nc(gy, gx)
                zz = lev[by, bx].reshape(-1)[ZIGZAG4]
                t = write_residual(bw, zz, nc)
                ncY.set(gy, gx, t)
                self.ncoef[mb, 1 + by * 4 + bx] = t
            else:
                ncY.set(gy, gx, 0)
        if cbp_chroma:
            for name in ("u", "v"):
                write_residual(bw, c_dc[name].reshape(-1)[[0, 1, 2, 3]], -1)
        for name, ctx in (("u", ncU), ("v", ncV)):
            for blk in range(4):
                by, bx = blk // 2, blk % 2
                gy, gx = my * 2 + by, mx * 2 + bx
                if cbp_chroma == 2:
                    nc = ctx.nc(gy, gx)
                    zz = c_lev[name][by, bx].reshape(-1)[ZIGZAG4][1:]
                    t = write_residual(bw, zz, nc)
                    ctx.set(gy, gx, t)
                else:
                    ctx.set(gy, gx, 0)

        # --- reconstruction (decoder-identical) ---
        self._recon_inter(ry, ru, rv, my, mx, pred, predu, predv,
                          lev if cbp_luma else None,
                          c_dc if cbp_chroma else None,
                          c_lev if cbp_chroma == 2 else None)
        return skip_run

    def _recon_inter(self, ry, ru, rv, my, mx, pred, predu, predv,
                     lev, c_dc, c_lev):
        qp, qpc = self.qp, self.qpc
        out = np.zeros((16, 16), np.int64)
        if lev is not None:
            for by in range(4):
                for bx in range(4):
                    wq = I.dequant4_ac(lev[by, bx], qp)
                    out[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = I.inv4(wq)
        ry[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
            np.clip(pred + out, 0, 255)
        for name, rec, predc in (("u", ru, predu), ("v", rv, predv)):
            outc = np.zeros((8, 8), np.int64)
            if c_dc is not None:
                fc = I._H2 @ c_dc[name] @ I._H2
                dccd = I.dequant_chroma_dc(fc, qpc)
                lv = c_lev[name] if c_lev is not None else \
                    np.zeros((2, 2, 4, 4), np.int64)
                for by in range(2):
                    for bx in range(2):
                        wq = I.dequant4_ac(lv[by, bx], qpc)
                        wq[0, 0] = dccd[by, bx]
                        outc[by * 4:by * 4 + 4,
                             bx * 4:bx * 4 + 4] = I.inv4(wq)
            rec[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
                np.clip(predc + outc, 0, 255)

    def _encode_intra16(self, bw, y, u, v, ry, ru, rv, my, mx, mode,
                        ncY, ncU, ncV):
        """I_16x16 inside a P slice: mb_type = 5 + intra type."""
        # reuse the intra module's encoder body via a tiny adapter that
        # prefixes the P-slice mb_type offset
        I._encode_mb(bw, y, u, v, ry, ru, rv, my, mx, self.qp,
                     ncY, ncU, ncV, mb_type_offset=5,
                     chroma_qp=self.qpc)
        mb = my * self.mb_w + mx
        self.qp_arr[mb] = self.qp


def _quant_dc_inter(wdc, qp):
    """Chroma DC quant with inter deadzone."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 6
    mf = I._MF[qp % 6][0]
    return (np.sign(wdc) * ((np.abs(wdc) * mf + 2 * f) >> (qbits + 1))
            ).astype(np.int64)
