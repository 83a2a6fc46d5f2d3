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

    def __init__(self, sps, qp, pps):
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

    def on_tu(self, x0, y0, log2, cidx, coeffs, mode):
        n = 1 << log2
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

        def avail(sx, sy):
            return bool(done[sy >> shift, sx >> shift])

        pred = self.pred[cidx].predict(px, py, n, mode, cidx, avail)
        if coeffs is not None:
            d = R.dequant(coeffs, qp, log2)
            res = R.inverse_transform(
                d, use_dst=(cidx == 0 and log2 == 2))
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


@register_decoder
class HevcDecoder(Decoder):
    """HEVC Main intra (IDR pictures, 4:2:0, deblock/SAO-free point)."""

    INFO = CodecInfo(name="hevc", long_name="HEVC / H.265",
                     codec_type="video")
    ALIASES = ("h265",)

    def __init__(self, params=None, **opts):
        self.sps = None
        self.pps = None
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
        for ntype, rbsp in PS.split_nals(bytes(pkt.data)):
            if ntype == PS.NAL_SPS:
                self.sps = PS.parse_sps(rbsp)
            elif ntype == PS.NAL_PPS:
                self.pps = PS.parse_pps(rbsp)
            elif ntype in (PS.NAL_IDR_W_RADL, 20):
                frames.append(self._decode_slice(rbsp, ntype, pkt))
            elif ntype < 32:
                raise Unsupported(
                    f"hevc: nal type {ntype} (non-IDR pictures)")
        return frames

    def flush(self):
        return []

    def _decode_slice(self, rbsp, ntype, pkt):
        if self.sps is None or self.pps is None:
            raise InvalidData("hevc: slice before SPS/PPS")
        sh = PS.parse_slice_header(rbsp, self.sps, self.pps, ntype)
        pic = _PicRecon(self.sps, sh.qp, self.pps)
        dec = CabacDecoder(rbsp, sh.data_bit_pos, 0, sh.qp)
        coder = CtuCoder(self.sps, self.pps, sh.qp, dec=dec,
                         on_tu=pic.on_tu)
        coder.code_picture()
        if dec.error:
            raise InvalidData("hevc: slice overread")
        tb = pkt.time_base if pkt.time_base.valid and pkt.time_base.num \
            else Rational(1, 25)
        return VideoFrame(planes=(pic.y, pic.u, pic.v),
                          format="yuv420p", width=self.sps.width,
                          height=self.sps.height, pts=pkt.pts,
                          time_base=tb)


# ---------------------------------------------------------------------------
# conformance stream generator
# ---------------------------------------------------------------------------

def generate_stream(width: int, height: int, n_frames: int = 1, *,
                    seed: int = 0, qp: int = 30, ctb_log2: int = 5,
                    density: float = 0.25, amp: int = 6,
                    split_prob: float = 0.35,
                    nxn_prob: float = 0.3) -> bytes:
    """Randomized-but-valid intra HEVC stream (annex B)."""
    sps = PS.HevcSPS(width=width, height=height, log2_ctb=ctb_log2,
                     log2_max_tb=min(5, ctb_log2))
    pps = PS.HevcPPS(init_qp=qp)
    out = bytearray()
    out += PS.write_vps()
    out += PS.write_sps(sps)
    out += PS.write_pps(pps)
    for i in range(n_frames):
        hdr = PS.write_slice_header(sps, pps, qp)
        enc = CabacEncoder(0, qp)
        ch = Chooser(seed=seed + 1000 * i, qp=qp, density=density,
                     amp=amp, split_prob=split_prob, nxn_prob=nxn_prob)
        coder = CtuCoder(sps, pps, qp, enc=enc, chooser=ch)
        coder.code_picture()
        rbsp = hdr.bytes() + enc.bytes()
        out += PS.rbsp_to_nal(rbsp, PS.NAL_IDR_W_RADL)
    return bytes(out)
