"""HEVC decoder (Main profile intra feature point) + conformance
stream generator.

Decode path: parameter sets (ps.py) -> slice header -> CABAC CTU walk
(ctu.py, shared with the generator) -> per-TU dequant + inverse
transform + intra prediction (recon.py) in z-order. The generator
drives the same walker in encode mode with randomized legal choices —
both are validated bit-exactly against the reference decoder.

Behavioral reference: /root/reference/libavcodec/hevc/hevcdec.c:4310.
"""
from __future__ import annotations

import numpy as np

from librempeg_tpu.codecs.api import CodecInfo, Decoder, register_decoder
from librempeg_tpu.codecs.hevc import ps as PS
from librempeg_tpu.codecs.hevc import recon as R
from librempeg_tpu.codecs.hevc.cabac import CabacDecoder, CabacEncoder
from librempeg_tpu.codecs.hevc.ctu import Chooser, CtuCoder
from librempeg_tpu.core.errors import InvalidData, Unsupported
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational


class _PicRecon:
    """Per-picture reconstruction driven by CtuCoder callbacks."""

    def __init__(self, sps, qp, pps, ref=None, max_merge=5):
        w, h = sps.width, sps.height
        self.y = np.zeros((h, w), np.uint8)
        self.u = np.full((h // 2, w // 2), 0, np.uint8)
        self.v = np.full((h // 2, w // 2), 0, np.uint8)
        self.done = [np.zeros((h // 4, w // 4), bool),
                     np.zeros((h // 4, w // 4), bool),
                     np.zeros((h // 4, w // 4), bool)]
        self.qp = qp
        self.qp_cb = R.chroma_qp(qp, pps.cb_qp_offset)
        self.qp_cr = R.chroma_qp(qp, pps.cr_qp_offset)
        self.sps = sps
        self.pred = [R.IntraPred(self.y, sps.strong_intra_smoothing),
                     R.IntraPred(self.u, False),
                     R.IntraPred(self.v, False)]
        # inter state: ref planes, per-4x4 prediction info (the
        # tab_mvf analog, hevcdec.c:2152)
        self.ref = ref                  # (y, u, v) of the L0[0] pic
        self.max_merge = max_merge
        self.pred4 = np.full((h // 4, w // 4), -1, np.int8)
        self.mv4 = np.zeros((h // 4, w // 4, 2), np.int32)
        self.part_mode = 0              # current CU's part (for merge)
        # deblock maps (4x4 luma cells): luma cbf, TB/PB edge flags
        h4, w4 = h // 4, w // 4
        self.cbf4 = np.zeros((h4, w4), bool)
        self.tuedge_v = np.zeros((h4, w4), bool)
        self.tuedge_h = np.zeros((h4, w4), bool)
        self.pbedge_v = np.zeros((h4, w4), bool)
        self.pbedge_h = np.zeros((h4, w4), bool)
        # per-4x4 slice-id grid (the walker's; None = single slice):
        # prediction never crosses slice segments (§6.4.1)
        self.slice4 = None

    def _sl_ok(self, cy, cx, cur_sl) -> bool:
        return self.slice4 is None or self.slice4[cy, cx] == cur_sl

    def _cur_sl(self, gx, gy):
        return 0 if self.slice4 is None else int(self.slice4[gy, gx])

    def deblock_maps(self):
        return {"intra": self.pred4 == 0, "inter": self.pred4 == 1,
                "cbf": self.cbf4, "mv": self.mv4,
                "tuedge_v": self.tuedge_v, "tuedge_h": self.tuedge_h,
                "pbedge_v": self.pbedge_v, "pbedge_h": self.pbedge_h}

    def on_cu(self, x0, y0, log2, part_nxn, modes, chroma_mode):
        n4 = (1 << log2) // 4
        self.pred4[y0 // 4:y0 // 4 + n4, x0 // 4:x0 // 4 + n4] = 0

    def on_tu(self, x0, y0, log2, cidx, coeffs, mode):
        n = 1 << log2
        if cidx == 0:                   # deblock maps (luma TBs only)
            g0x, g0y, gn = x0 // 4, y0 // 4, n // 4
            self.tuedge_v[g0y:g0y + gn, g0x] = True
            self.tuedge_h[g0y, g0x:g0x + gn] = True
            if coeffs is not None:
                self.cbf4[g0y:g0y + gn, g0x:g0x + gn] = True
        if cidx == 0:
            plane, qp = self.y, self.qp
            px, py = x0, y0
        else:
            plane = self.u if cidx == 1 else self.v
            qp = self.qp_cb if cidx == 1 else self.qp_cr
            px, py = x0 // 2, y0 // 2
        done = self.done[cidx]
        # the done grid is 4x4 in LUMA coords; chroma planes index it
        # at half resolution (2 chroma samples per cell)
        shift = 2 if cidx == 0 else 1
        cur_sl = self._cur_sl(px >> shift, py >> shift)

        def avail(sx, sy):
            cy, cx = sy >> shift, sx >> shift
            return bool(done[cy, cx]) and self._sl_ok(cy, cx, cur_sl)

        if mode >= 0:                   # intra TU
            pred = self.pred[cidx].predict(px, py, n, mode, cidx,
                                           avail)
        else:                           # inter: MC already in plane
            pred = plane[py:py + n, px:px + n].astype(np.int32)
        if coeffs is not None:
            d = R.dequant(coeffs, qp, log2)
            res = R.inverse_transform(
                d, use_dst=(cidx == 0 and log2 == 2 and mode >= 0))
            out = np.clip(pred + res, 0, 255)
        else:
            out = pred
        plane[py:py + n, px:px + n] = out.astype(np.uint8)
        # mark done at 4x4 luma-equivalent granularity
        if cidx == 0:
            done[py // 4:(py + n) // 4, px // 4:(px + n) // 4] = True
        else:
            done[py * 2 // 4:(py + n) * 2 // 4,
                 px * 2 // 4:(px + n) * 2 // 4] = True

    # ---------------------------------------------------------- inter
    def _nb(self, x, y, cur_sl=0):
        """Neighbor MV at luma (x, y), or None when outside the
        picture, not yet decoded (z-scan order), in another slice,
        or intra."""
        h4, w4 = self.pred4.shape
        gx, gy = x >> 2, y >> 2
        if x < 0 or y < 0 or gx >= w4 or gy >= h4:
            return None
        if not self._sl_ok(gy, gx, cur_sl):
            return None
        if self.pred4[gy, gx] != 1:
            return None
        return (int(self.mv4[gy, gx, 0]), int(self.mv4[gy, gx, 1]))

    def _merge_list(self, x0, y0, w, h, part, idx):
        """Spatial merge candidates + zero fill (mvs.c:287; temporal
        MVP disabled in the SPS, P slice so no combined-bi)."""
        sl = self._cur_sl(x0 >> 2, y0 >> 2)
        cands = []
        a1 = b1 = None
        if not (idx == 1 and part == 2):        # Nx2N PU1: A1 excluded
            a1 = self._nb(x0 - 1, y0 + h - 1, sl)
            if a1 is not None:
                cands.append(a1)
        if not (idx == 1 and part == 1):        # 2NxN PU1: B1 excluded
            b1 = self._nb(x0 + w - 1, y0 - 1, sl)
            if b1 is not None and b1 != a1:
                cands.append(b1)
        b0 = self._nb(x0 + w, y0 - 1, sl)
        if b0 is not None and b0 != b1:
            cands.append(b0)
        a0 = self._nb(x0 - 1, y0 + h, sl)
        if a0 is not None and a0 != a1:
            cands.append(a0)
        if len(cands) != 4:
            b2 = self._nb(x0 - 1, y0 - 1, sl)
            if b2 is not None and b2 != a1 and b2 != b1:
                cands.append(b2)
        while len(cands) < self.max_merge:
            cands.append((0, 0))
        return cands

    def _amvp(self, x0, y0, w, h):
        """AMVP candidate pair (mvs.c ff_hevc_luma_mv_mvp_mode; single
        same-POC reference so the scaling branches are identities)."""
        sl = self._cur_sl(x0 >> 2, y0 >> 2)
        a0 = self._nb(x0 - 1, y0 + h, sl)
        a1 = self._nb(x0 - 1, y0 + h - 1, sl)
        scaled = a0 is not None or a1 is not None
        mxa = a0 if a0 is not None else a1
        b0 = self._nb(x0 + w, y0 - 1, sl)
        b1 = self._nb(x0 + w - 1, y0 - 1, sl)
        b2 = self._nb(x0 - 1, y0 - 1, sl)
        mxb = b0 if b0 is not None else (
            b1 if b1 is not None else b2)
        avail_a = mxa is not None
        avail_b = mxb is not None
        if not scaled and avail_b:
            mxa, avail_a = mxb, True
        out = []
        if avail_a:
            out.append(mxa)
        if avail_b and (not avail_a or mxb != mxa):
            out.append(mxb)
        while len(out) < 2:
            out.append((0, 0))
        return out

    def on_pu(self, x0, y0, w, h, part, idx, pu):
        if pu["merge"]:
            mv = self._merge_list(x0, y0, w, h, part,
                                  idx)[pu["merge_idx"]]
        else:
            p = self._amvp(x0, y0, w, h)[pu["mvp"]]
            mv = (p[0] + pu["mvd"][0], p[1] + pu["mvd"][1])
        gx, gy = x0 // 4, y0 // 4
        self.pred4[gy:gy + h // 4, gx:gx + w // 4] = 1
        self.mv4[gy:gy + h // 4, gx:gx + w // 4] = mv
        self.pbedge_v[gy:gy + h // 4, gx] = True
        self.pbedge_h[gy, gx:gx + w // 4] = True
        ry, ru, rv = self.ref
        self.y[y0:y0 + h, x0:x0 + w] = R.mc_luma(
            ry, x0, y0, w, h, mv[0], mv[1])
        cw, chh = w // 2, h // 2
        self.u[y0 // 2:y0 // 2 + chh, x0 // 2:x0 // 2 + cw] = \
            R.mc_chroma(ru, x0 // 2, y0 // 2, cw, chh, mv[0], mv[1])
        self.v[y0 // 2:y0 // 2 + chh, x0 // 2:x0 // 2 + cw] = \
            R.mc_chroma(rv, x0 // 2, y0 // 2, cw, chh, mv[0], mv[1])
        for d in self.done:
            d[y0 // 4:(y0 + h) // 4, x0 // 4:(x0 + w) // 4] = True


@register_decoder
class HevcDecoder(Decoder):
    """HEVC Main intra (IDR pictures, 4:2:0, deblock/SAO-free point)."""

    INFO = CodecInfo(name="hevc", long_name="HEVC / H.265",
                     codec_type="video")
    ALIASES = ("h265",)

    def __init__(self, params=None, **opts):
        self.sps = None
        self.pps = None
        self._ref = None                # last decoded picture (L0[0])
        super().__init__(params, **opts)

    def configure(self, params):
        if params.extradata and bytes(params.extradata[:1]) == b"\x00":
            self._headers(bytes(params.extradata))

    def _headers(self, data: bytes):
        for ntype, rbsp in PS.split_nals(data):
            if ntype == PS.NAL_SPS:
                self.sps = PS.parse_sps(rbsp)
            elif ntype == PS.NAL_PPS:
                self.pps = PS.parse_pps(rbsp)

    def decode(self, pkt):
        frames = []
        pending = []                    # slice NALs of one picture
        for ntype, rbsp in PS.split_nals(bytes(pkt.data)):
            if ntype == PS.NAL_SPS:
                self.sps = PS.parse_sps(rbsp)
            elif ntype == PS.NAL_PPS:
                self.pps = PS.parse_pps(rbsp)
            elif ntype in (PS.NAL_IDR_W_RADL, 20, 0, 1):
                if self.sps is None or self.pps is None:
                    raise InvalidData("hevc: slice before SPS/PPS")
                sh = PS.parse_slice_header(rbsp, self.sps, self.pps,
                                           ntype)
                if sh.first_slice and pending:
                    frames.append(self._decode_picture(pending, pkt))
                    pending = []
                pending.append((ntype, rbsp, sh))
            elif ntype < 32:
                raise Unsupported(
                    f"hevc: nal type {ntype} (B/RASL pictures)")
        if pending:
            frames.append(self._decode_picture(pending, pkt))
        return frames

    def flush(self):
        return []

    def _decode_picture(self, slices, pkt):
        """Decode one picture's slice segments (all NALs of one AU)."""
        ntype, _, sh0 = slices[0]
        if not sh0.first_slice:
            raise InvalidData("hevc: picture lacks its first slice")
        if ntype in (19, 20):
            self._ref = None            # IDR: DPB reset
        if sh0.slice_type != 2 and self._ref is None:
            raise InvalidData("hevc: P slice without a reference")
        pic = _PicRecon(self.sps, sh0.qp, self.pps, ref=self._ref,
                        max_merge=sh0.max_merge)
        coder = CtuCoder(self.sps, self.pps, sh0.qp,
                         dec=None,
                         on_tu=pic.on_tu, on_cu=pic.on_cu,
                         on_pu=pic.on_pu, slice_type=sh0.slice_type,
                         max_merge=sh0.max_merge, sao_luma=sh0.sao_luma,
                         sao_chroma=sh0.sao_chroma)
        if len(slices) > 1:
            pic.slice4 = coder.slice4
        n_ctb = self.sps.pic_w_ctb * self.sps.pic_h_ctb
        sh = sh0
        for k, (nt, rbsp, sh) in enumerate(slices):
            start = sh.segment_address
            end = slices[k + 1][2].segment_address \
                if k + 1 < len(slices) else n_ctb
            if (k == 0 and start != 0) or not start < end <= n_ctb:
                raise InvalidData("hevc: bad slice segment order")
            dec = CabacDecoder(rbsp, sh.data_bit_pos, sh.init_type,
                               sh.qp)
            coder.dec = dec
            coder.slice_type = sh.slice_type
            coder.max_merge = sh.max_merge
            pic.max_merge = sh.max_merge
            coder.code_slice(start, end, slice_id=k)
            if dec.error:
                raise InvalidData("hevc: slice overread")
        sh = sh0
        if not self.pps.deblocking_disabled:
            from librempeg_tpu.codecs.hevc.deblock import deblock_picture

            deblock_picture(pic, self.sps, self.pps, sh)
        if sh.sao_luma or sh.sao_chroma:
            from librempeg_tpu.codecs.hevc.sao import sao_filter_picture

            pic.sao = coder.saog
            sao_filter_picture(pic, self.sps, sh)
        self._ref = (pic.y, pic.u, pic.v)
        tb = pkt.time_base if pkt.time_base.valid and pkt.time_base.num \
            else Rational(1, 25)
        sps = self.sps
        ow, oh = sps.out_width, sps.out_height
        cl, ct = sps.crop_l, sps.crop_t
        planes = (pic.y[ct:ct + oh, cl:cl + ow],
                  pic.u[ct // 2:(ct + oh) // 2, cl // 2:(cl + ow) // 2],
                  pic.v[ct // 2:(ct + oh) // 2, cl // 2:(cl + ow) // 2])
        return VideoFrame(planes=planes,
                          format="yuv420p", width=ow,
                          height=oh, pts=pkt.pts,
                          time_base=tb)


# ---------------------------------------------------------------------------
# conformance stream generator
# ---------------------------------------------------------------------------

def generate_stream(width: int, height: int, n_frames: int = 1, *,
                    seed: int = 0, qp: int = 30, ctb_log2: int = 5,
                    density: float = 0.25, amp: int = 6,
                    split_prob: float = 0.35, nxn_prob: float = 0.3,
                    p_frames: bool = False, max_merge: int = 5,
                    deblock: bool = False, beta_offset: int = 0,
                    tc_offset: int = 0, sao: bool = False,
                    sao_chroma: bool | None = None,
                    slices: int = 1) -> bytes:
    """Randomized-but-valid HEVC stream (annex B): an IDR picture,
    followed by TRAIL_R P pictures when p_frames is set.

    width/height are the DISPLAY size; non-multiple-of-8 dimensions get
    a coded size rounded up to the min-CB grid plus a conformance
    window (§7.4.3.2.1) cropping back — the path every real-encoder
    stream with an odd display size exercises."""
    cw = (width + 7) & ~7
    ch = (height + 7) & ~7
    sps = PS.HevcSPS(width=cw, height=ch, crop_r=cw - width,
                     crop_b=ch - height, log2_ctb=ctb_log2,
                     log2_max_tb=min(5, ctb_log2), sao_enabled=sao)
    pps = PS.HevcPPS(init_qp=qp, deblocking_disabled=not deblock,
                     beta_offset=beta_offset, tc_offset=tc_offset)
    sao_c = sao if sao_chroma is None else sao_chroma
    out = bytearray()
    out += PS.write_vps()
    out += PS.write_sps(sps)
    out += PS.write_pps(pps)
    n_ctb = sps.pic_w_ctb * sps.pic_h_ctb
    nsl = max(1, min(slices, n_ctb))
    bounds = [round(k * n_ctb / nsl) for k in range(nsl + 1)]
    for i in range(n_frames):
        is_p = p_frames and i > 0
        stype = 1 if is_p else 2
        ch = Chooser(seed=seed + 1000 * i, qp=qp, density=density,
                     amp=amp, split_prob=split_prob, nxn_prob=nxn_prob)
        coder = CtuCoder(sps, pps, qp, enc=None, chooser=ch,
                         slice_type=stype, max_merge=max_merge,
                         sao_luma=sao, sao_chroma=sao_c)
        for k in range(nsl):
            hdr = PS.write_slice_header(
                sps, pps, qp, slice_type=stype,
                poc_lsb=i % (1 << sps.log2_max_poc_lsb),
                max_merge=max_merge, sao_luma=sao, sao_chroma=sao_c,
                first_slice=(k == 0), segment_address=bounds[k])
            enc = CabacEncoder(1 if is_p else 0, qp)
            coder.enc = enc
            coder.code_slice(bounds[k], bounds[k + 1], slice_id=k)
            rbsp = hdr.bytes() + enc.bytes()
            out += PS.rbsp_to_nal(
                rbsp, 1 if is_p else PS.NAL_IDR_W_RADL)
    return bytes(out)
