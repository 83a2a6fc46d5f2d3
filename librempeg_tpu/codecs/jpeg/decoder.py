"""JPEG / MJPEG decoder.

Analog of /root/reference/libavcodec/mjpegdec.c, restructured for TPU:
the host parses markers and runs the serial Huffman scan decode in the
C++ extension (librempeg_tpu/native); the per-pixel work — dequant,
8x8 IDCT, block placement — happens in ONE jitted device program over
all blocks of the frame.

Supports baseline sequential DCT (SOF0; SOF1 extended sequential with
8-bit samples decodes identically), grayscale and 4:4:4 / 4:2:2 /
4:2:0 / 4:1:1 subsampling, restart intervals, and multi-frame MJPEG
streams (one packet = one JPEG image).
"""
from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.codecs.api import CodecInfo, Decoder, register_decoder
from librempeg_tpu.codecs.jpeg import tables as T
from librempeg_tpu.core.errors import InvalidData, Unsupported
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.native import build as native
from librempeg_tpu.ops import dct8x8

# markers
SOI, EOI, SOS, DQT, DHT, DRI = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD
SOF0, SOF1, SOF2 = 0xC0, 0xC1, 0xC2
APP0, COM = 0xE0, 0xFE


@functools.partial(jax.jit, static_argnames=("h8", "w8"))
def _blocks_to_plane(coeffs_zz: jax.Array, qtab: jax.Array, h8: int, w8: int
                     ) -> jax.Array:
    """[nblocks, 64] zigzag int -> [h8*8, w8*8] uint8 plane.

    Dequant + de-zigzag + fixed-point IDCT + level shift, one fused
    device program (the entire per-pixel half of JPEG decode).
    """
    dq = coeffs_zz.astype(jnp.int32) * qtab[None, :]
    raster = jnp.zeros_like(dq).at[:, jnp.asarray(T.ZIGZAG)].set(dq)
    blocks = raster.reshape(-1, 8, 8)
    pix = dct8x8.idct_int(blocks) + 128
    pix = jnp.clip(pix, 0, 255).astype(jnp.uint8)
    return dct8x8.from_blocks(pix, h8 * 8, w8 * 8)


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc", "ac")

    def __init__(self):
        self.cid = 0
        self.h = self.v = 1
        self.tq = self.dc = self.ac = 0


@register_decoder
class JpegDecoder(Decoder):
    INFO = CodecInfo(name="mjpeg", long_name="Motion JPEG / JPEG",
                     codec_type="video")

    def __init__(self, params=None, **opts):
        self._frame_idx = 0
        super().__init__(params, **opts)

    def decode(self, pkt):
        frame = decode_jpeg(bytes(pkt.data))
        tb = pkt.time_base if pkt.time_base.valid and pkt.time_base.num else \
            Rational(1, 25)
        pts = pkt.pts
        self._frame_idx += 1
        return [frame.replace(pts=pts, time_base=tb)]


def decode_jpeg(data: bytes) -> VideoFrame:
    """Decode one JPEG image to a VideoFrame (yuvj* / gray)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != SOI:
        raise InvalidData("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tables: dict[int, tuple] = {}
    ac_tables: dict[int, tuple] = {}
    comps: list[_Component] = []
    width = height = 0
    restart = 0
    progressive = False

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (SOI, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == EOI:
            break
        if pos + 2 > len(data):
            raise InvalidData("truncated JPEG segment")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == DQT:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    qtabs[tq] = np.frombuffer(seg[p:p + 64], np.uint8
                                              ).astype(np.int32)
                    p += 64
                else:
                    qtabs[tq] = np.frombuffer(seg[p:p + 128], ">u2"
                                              ).astype(np.int32)
                    p += 128
        elif marker == DHT:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = np.frombuffer(seg[p + 1:p + 17], np.uint8)
                n = int(bits.sum())
                vals = np.frombuffer(seg[p + 17:p + 17 + n], np.uint8)
                (dc_tables if tc == 0 else ac_tables)[th] = (bits, vals)
                p += 17 + n
        elif marker in (SOF0, SOF1, SOF2):
            if marker == SOF2:
                progressive = True
            prec = seg[0]
            if prec != 8:
                raise Unsupported(f"JPEG precision {prec}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                comp = _Component()
                comp.cid = seg[6 + 3 * c]
                comp.h = seg[7 + 3 * c] >> 4
                comp.v = seg[7 + 3 * c] & 15
                comp.tq = seg[8 + 3 * c]
                comps.append(comp)
        elif marker == DRI:
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == SOS:
            ns = seg[0]
            for i in range(ns):
                cs = seg[1 + 2 * i]
                tn = seg[2 + 2 * i]
                for comp in comps:
                    if comp.cid == cs:
                        comp.dc = tn >> 4
                        comp.ac = tn & 15
            scan_start = pos + seglen
            return _decode_scan(data, scan_start, comps, qtabs,
                                dc_tables, ac_tables, width, height,
                                restart, progressive)
        pos += seglen
    raise InvalidData("JPEG: no SOS marker found")


def _decode_scan(data, scan_start, comps, qtabs, dc_tables, ac_tables,
                 width, height, restart, progressive) -> VideoFrame:
    if progressive:
        raise Unsupported("progressive JPEG (round-1 scope: baseline)")
    if not native.available():
        raise Unsupported("native extension unavailable for JPEG decode")
    # All of this is file-controlled; validate before it reaches the
    # native scan decoder (reference guards the same way: mjpegdec.c
    # table/index validation).
    if not comps:
        raise InvalidData("JPEG: SOS before SOF / no components")
    for c in comps:
        if not (1 <= c.h <= 4 and 1 <= c.v <= 4):
            raise InvalidData(f"JPEG: bad sampling factors {c.h}x{c.v}")
        if not (0 <= getattr(c, "dc", -1) < 4 and
                0 <= getattr(c, "ac", -1) < 4):
            raise InvalidData("JPEG: huffman table index out of range")
        if c.dc not in dc_tables or c.ac not in ac_tables:
            raise InvalidData("JPEG: scan references undefined huffman table")
        if c.tq not in qtabs:
            raise InvalidData("JPEG: scan references undefined quant table")
    for kind, tabs in (("dc", dc_tables), ("ac", ac_tables)):
        for th, (bits, vals) in tabs.items():
            n = int(np.asarray(bits).sum())
            if n == 0 or n > 256 or n > len(vals):
                raise InvalidData(f"JPEG: malformed {kind} huffman table "
                                  f"{th}: {n} codes, {len(vals)} values")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    mcu_count = mcus_x * mcus_y

    cspec = [{"h": c.h, "v": c.v, "dc": c.dc, "ac": c.ac} for c in comps]
    dct = [dc_tables.get(i, (np.zeros(16, np.uint8), np.zeros(0, np.uint8)))
           for i in range(4)]
    act = [ac_tables.get(i, (np.zeros(16, np.uint8), np.zeros(0, np.uint8)))
           for i in range(4)]
    # scan data ends at EOI (native reader stops at any marker anyway)
    coeffs = native.jpeg_decode_scan(
        data[scan_start:], cspec, dct, act, mcu_count, restart)

    # split interleaved MCU blocks into per-component planar grids
    blocks_per_mcu = sum(c.h * c.v for c in comps)
    planes = []
    offset = 0
    for c in comps:
        nbx = mcus_x * c.h
        nby = mcus_y * c.v
        # indices of this component's blocks inside each MCU
        sel = np.zeros((mcu_count, c.h * c.v), np.int64)
        base = np.arange(mcu_count) * blocks_per_mcu + offset
        sel[:] = base[:, None] + np.arange(c.h * c.v)[None, :]
        comp_blocks = coeffs[sel.reshape(-1)]       # [nby*nbx, 64] MCU order
        # MCU order -> raster block order
        order = np.arange(mcu_count * c.h * c.v).reshape(
            mcus_y, mcus_x, c.v, c.h).transpose(0, 2, 1, 3).reshape(-1)
        comp_blocks = comp_blocks[order]
        q = qtabs[c.tq]
        plane = _blocks_to_plane(jnp.asarray(comp_blocks), jnp.asarray(q),
                                 nby, nbx)
        planes.append(plane)
        offset += c.h * c.v

    return _assemble_frame(planes, comps, width, height, hmax, vmax)


def _assemble_frame(planes, comps, width, height, hmax, vmax) -> VideoFrame:
    if len(comps) == 1:
        fmt = "gray"
        crop = (np.asarray(planes[0])[:height, :width],)
        return VideoFrame(planes=crop, format=fmt, width=width,
                          height=height, color_range="jpeg").validate()
    if len(comps) != 3:
        raise Unsupported(f"JPEG with {len(comps)} components")
    sampling = (comps[1].h * vmax // comps[1].v if False else
                (hmax // comps[1].h, vmax // comps[1].v))
    fmt_map = {(1, 1): "yuvj444p", (2, 1): "yuvj422p", (2, 2): "yuvj420p",
               (4, 1): "yuv411p", (1, 2): "yuv440p"}
    fmt = fmt_map.get(sampling)
    if fmt is None:
        raise Unsupported(f"JPEG sampling {sampling}")
    from librempeg_tpu.core import pixfmt as pf

    desc = pf.get(fmt)
    out = []
    for i, p in enumerate(planes):
        ph, pw = desc.plane_shape(i, height, width)
        out.append(np.asarray(p)[:ph, :pw])
    return VideoFrame(planes=tuple(out), format=fmt, width=width,
                      height=height, color_range="jpeg").validate()
