"""H.264 codec classes: I_16x16 intra encoder + matching decoder.

The encoder's reconstruction is bit-exact with the reference decoder
(validated in tests at multiple QPs), so the decoder below reuses the
identical transform/dequant path after CAVLC parsing.
"""
from __future__ import annotations

import numpy as np

from librempeg_tpu.codecs.api import (
    CodecInfo,
    Decoder,
    Encoder,
    register_decoder,
    register_encoder,
)
from librempeg_tpu.codecs.flac.bitio import BitReaderMSB
from librempeg_tpu.codecs.h264 import intra as I
from librempeg_tpu.codecs.h264.cavlc import ZIGZAG4, read_residual
from librempeg_tpu.codecs.h264.parse import (
    ExpGolombReader,
    NalUnit,
    parse_pps,
    parse_sps,
    split_annexb,
)
from librempeg_tpu.core.errors import InvalidData, Unsupported
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.options import Option, OptionTable
from librempeg_tpu.core.packet import Packet, PktFlags
from librempeg_tpu.core.rational import NOPTS, Rational


@register_encoder
class H264IntraEncoder(Encoder):
    INFO = CodecInfo(name="h264", long_name="H.264 / AVC (intra baseline)",
                     codec_type="video")
    OPTIONS = OptionTable(
        Option("qp", int, 26, min=0, max=51),
    )

    def __init__(self, width=0, height=0, pix_fmt="yuv420p",
                 framerate: Rational = Rational(25, 1), **opts):
        super().__init__(**opts)
        if width % 16 or height % 16:
            raise Unsupported("h264: dimensions must be 16-aligned "
                              "(round-1; cropping lands next)")
        self.width, self.height = width, height
        self.framerate = framerate
        self.time_base = Rational(framerate.den, framerate.num)
        self._idx = 0
        self._next_pts = 0

    def codec_parameters(self):
        from librempeg_tpu.formats.api import CodecParameters

        return CodecParameters(
            codec_type="video", codec_id="h264",
            width=self.width, height=self.height, pix_fmt="yuv420p",
            framerate=self.framerate,
            extradata=I.build_sps(self.width // 16, self.height // 16)
            + I.build_pps())

    def encode(self, frame: VideoFrame):
        if frame.format not in ("yuv420p", "yuvj420p"):
            raise Unsupported("h264: input must be yuv420p")
        y, u, v = (np.asarray(p) for p in frame.planes)
        data = b""
        if self._idx == 0:
            data += I.build_sps(self.width // 16, self.height // 16)
            data += I.build_pps()
        data += I.encode_idr(y, u, v, qp=self.opts["qp"],
                             frame_idx=self._idx)
        pts = frame.pts if frame.pts != NOPTS else self._next_pts
        self._next_pts = pts + 1
        self._idx += 1
        return [Packet(data=data, pts=pts, dts=pts, duration=1,
                       flags=PktFlags.KEY, time_base=self.time_base)]


@register_decoder
class H264Decoder(Decoder):
    INFO = CodecInfo(name="h264", long_name="H.264 / AVC (intra baseline)",
                     codec_type="video")

    def __init__(self, params=None, **opts):
        self.sps = None
        self.pps = None
        super().__init__(params, **opts)

    def configure(self, params):
        if params.extradata and params.extradata[:1] == b"\x00":
            for nal in split_annexb(bytes(params.extradata)):
                self._handle_nal(NalUnit.parse(nal))

    def _handle_nal(self, nal: NalUnit):
        if nal.type == 7:
            self.sps = parse_sps(nal.rbsp)
        elif nal.type == 8:
            self.pps = parse_pps(nal.rbsp)

    def decode(self, pkt: Packet):
        frames = []
        for raw in split_annexb(bytes(pkt.data)):
            nal = NalUnit.parse(raw)
            if nal.type in (7, 8):
                self._handle_nal(nal)
            elif nal.type in (1, 5):
                frames.append(self._decode_slice(nal, pkt))
        return [f for f in frames if f is not None]

    def _decode_slice(self, nal: NalUnit, pkt: Packet) -> VideoFrame:
        if self.sps is None or self.pps is None:
            raise InvalidData("h264: slice before SPS/PPS")
        if self.pps.entropy_coding_mode:
            raise Unsupported("h264: CABAC (round-2)")
        g = ExpGolombReader(nal.rbsp)
        first_mb = g.ue()
        slice_type = g.ue()
        if slice_type % 5 != 2:
            raise Unsupported("h264: only I slices (round-1)")
        g.ue()                                  # pps id
        g.u(self.sps.log2_max_frame_num)        # frame_num
        if nal.type == 5:
            g.ue()                              # idr_pic_id
        if self.sps.pic_order_cnt_type == 0:
            g.u(self.sps.log2_max_poc_lsb)
        if nal.type == 5:
            g.u(1)
            g.u(1)
        qp = self.pps.pic_init_qp + g.se()
        if self.pps.deblocking_filter_control_present:
            idc = g.ue()
            if idc != 1:
                raise Unsupported("h264: in-loop deblocking (round-2)")

        w = self.sps.width
        h = self.sps.height
        mb_w, mb_h = w // 16, h // 16
        br = BitReaderMSB(nal.rbsp, bit_pos=g.pos)
        ry = np.zeros((h, w), np.int64)
        ru = np.zeros((h // 2, w // 2), np.int64)
        rv = np.zeros((h // 2, w // 2), np.int64)
        ncY = I._NcCtx(mb_h * 4, mb_w * 4)
        ncU = I._NcCtx(mb_h * 2, mb_w * 2)
        ncV = I._NcCtx(mb_h * 2, mb_w * 2)
        for my in range(mb_h):
            for mx in range(mb_w):
                self._decode_mb(br, ry, ru, rv, my, mx, qp, ncY, ncU, ncV)
        tb = pkt.time_base if pkt.time_base.valid and pkt.time_base.num \
            else Rational(1, 25)
        return VideoFrame(
            planes=(ry.astype(np.uint8), ru.astype(np.uint8),
                    rv.astype(np.uint8)),
            format="yuv420p", width=w, height=h, pts=pkt.pts, time_base=tb)

    def _decode_mb(self, br, ry, ru, rv, my, mx, qp, ncY, ncU, ncV):
        mb_type = _read_ue_br(br)
        if not (1 <= mb_type <= 24):
            raise Unsupported(f"h264: mb_type {mb_type} (round-1 decodes "
                              "I_16x16)")
        t = mb_type - 1
        pred_mode = t % 4
        cbp_chroma = (t // 4) % 3
        cbp_luma = 15 if t >= 12 else 0
        chroma_mode = _read_ue_br(br)
        _read_se_br(br)                          # mb_qp_delta (0)

        nc0 = ncY.nc(my * 4, mx * 4)
        dc_zz, _ = read_residual(br, 16, nc0)
        dc_lev = np.zeros(16, np.int64)
        dc_lev[ZIGZAG4] = dc_zz
        dc_lev = dc_lev.reshape(4, 4)
        ac_lev = np.zeros((4, 4, 4, 4), np.int64)
        for blk in range(16):
            by, bx = I._BLK4[blk]
            gy, gx = my * 4 + by, mx * 4 + bx
            if cbp_luma:
                nc = ncY.nc(gy, gx)
                zz, t2 = read_residual(br, 15, nc)
                full = np.zeros(16, np.int64)
                full[1:] = zz
                blk16 = np.zeros(16, np.int64)
                blk16[ZIGZAG4] = full
                ac_lev[by, bx] = blk16.reshape(4, 4)
                ncY.set(gy, gx, t2)
            else:
                ncY.set(gy, gx, 0)
        c_dc = {"u": np.zeros((2, 2), np.int64),
                "v": np.zeros((2, 2), np.int64)}
        if cbp_chroma:
            for name in ("u", "v"):
                zz, _ = read_residual(br, 4, -1)
                c_dc[name] = zz.reshape(2, 2)
        c_lev = {"u": np.zeros((2, 2, 4, 4), np.int64),
                 "v": np.zeros((2, 2, 4, 4), np.int64)}
        for name, ctx in (("u", ncU), ("v", ncV)):
            for blk in range(4):
                by, bx = blk // 2, blk % 2
                gy, gx = my * 2 + by, mx * 2 + bx
                if cbp_chroma == 2:
                    nc = ctx.nc(gy, gx)
                    zz, t2 = read_residual(br, 15, nc)
                    full = np.zeros(16, np.int64)
                    full[1:] = zz
                    blk16 = np.zeros(16, np.int64)
                    blk16[ZIGZAG4] = full
                    c_lev[name][by, bx] = blk16.reshape(4, 4)
                    ctx.set(gy, gx, t2)
                else:
                    ctx.set(gy, gx, 0)

        # reconstruction (same math as the encoder = bit-exact with ref)
        pred = I._pred16(ry, my, mx, pred_mode)
        fdc = I._H4 @ dc_lev @ I._H4
        dcd = I.dequant_luma_dc(fdc, qp)
        out = np.zeros((16, 16), np.int64)
        for by in range(4):
            for bx in range(4):
                wq = I.dequant4_ac(ac_lev[by, bx], qp)
                wq[0, 0] = dcd[by, bx]
                out[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = I.inv4(wq)
        ry[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = \
            np.clip(out + pred, 0, 255)
        for name, rec in (("u", ru), ("v", rv)):
            predc = I._pred8(rec, my, mx, chroma_mode)
            fc = I._H2 @ c_dc[name] @ I._H2
            dccd = I.dequant_chroma_dc(fc, qp)
            outc = np.zeros((8, 8), np.int64)
            for by in range(2):
                for bx in range(2):
                    wq = I.dequant4_ac(c_lev[name][by, bx], qp)
                    wq[0, 0] = dccd[by, bx]
                    outc[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = I.inv4(wq)
            rec[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = \
                np.clip(outc + predc, 0, 255)


def _read_ue_br(br: BitReaderMSB) -> int:
    zeros = 0
    while br.read(1) == 0:
        zeros += 1
        if zeros > 31:
            raise InvalidData("golomb overflow")
    return (1 << zeros) - 1 + (br.read(zeros) if zeros else 0)


def _read_se_br(br: BitReaderMSB) -> int:
    k = _read_ue_br(br)
    return (k + 1) >> 1 if k & 1 else -(k >> 1)
