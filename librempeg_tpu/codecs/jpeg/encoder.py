"""JPEG / MJPEG encoder.

Analog of /root/reference/libavcodec/mjpegenc.c: device fdct+quant over
all blocks at once, host C++ Huffman pack, JFIF container written here.
Uses the Annex K tables (like the reference's default tables).
"""
from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.codecs.api import CodecInfo, Encoder, register_encoder
from librempeg_tpu.codecs.jpeg import tables as T
from librempeg_tpu.core.errors import Unsupported
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.options import Option, OptionTable
from librempeg_tpu.core.packet import Packet, PktFlags
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.native import build as native
from librempeg_tpu.ops import dct8x8


@functools.partial(jax.jit, static_argnames=())
def _plane_to_coeffs(plane: jax.Array, qtab: jax.Array) -> jax.Array:
    """uint8 plane [H, W] -> [nblocks, 64] int16 zigzag quantized.

    fdct in the fixed-point IDCT's inverse scaling: we use the float
    orthonormal DCT with per-coefficient scale folded into the quant
    step (one fused device program; rounding half away from zero like
    the reference's quantizer).
    """
    x = plane.astype(jnp.float32) - 128.0
    blocks = dct8x8.to_blocks(x)
    # orthonormal fdct * 8 == JPEG's unnormalized DCT convention
    coeffs = dct8x8.fdct(blocks)
    scale = jnp.asarray(_jpeg_scale(), jnp.float32)
    coeffs = coeffs * scale[None, :, :]
    q = coeffs / qtab.reshape(8, 8)[None, :, :].astype(jnp.float32)
    lev = jnp.trunc(q + jnp.where(q >= 0, 0.5, -0.5)).astype(jnp.int32)
    flat = lev.reshape(-1, 64)
    zz = flat[:, jnp.asarray(T.ZIGZAG)]
    return zz.astype(jnp.int16)


@functools.lru_cache(maxsize=None)
def _huff_lengths(bits: tuple, vals: tuple) -> dict:
    """DHT (BITS, VALS) -> {symbol: code length}."""
    out = {}
    k = 0
    for ln, cnt in enumerate(bits, start=1):
        for _ in range(cnt):
            out[vals[k]] = ln
            k += 1
    return out


@functools.lru_cache(maxsize=None)
def _ac_bits_tables(chroma: bool):
    """Trellis bit-cost tables for the Annex K AC Huffman coder:
    (bits_notlast, bits_last) int32 [64 runs, 12 size categories].
    Runs > 15 decompose into ZRL codes; a last event additionally
    pays the EOB (exact except for a last coefficient at position
    63, where baseline JPEG omits EOB — a constant few-bit
    overcount on that rare ending)."""
    bits = T.AC_CHROMA_BITS if chroma else T.AC_LUMA_BITS
    vals = T.AC_CHROMA_VALS if chroma else T.AC_LUMA_VALS
    ln = _huff_lengths(tuple(int(x) for x in bits),
                       tuple(int(x) for x in vals))
    zrl = ln[0xF0]
    eob = ln[0x00]
    b0 = np.zeros((64, 12), np.int32)
    for run in range(64):
        for size in range(1, 12):
            sym = ((run % 16) << 4) | size
            b0[run, size] = (run // 16) * zrl + ln.get(sym, 64) + size
    b1 = b0 + eob
    return b0, b1


@functools.partial(jax.jit, static_argnames=("chroma",))
def _plane_to_coeffs_rd(plane: jax.Array, qtab: jax.Array, lam,
                        chroma: bool) -> jax.Array:
    """Trellis variant of _plane_to_coeffs: RD-optimal AC levels under
    the component's Huffman table, conventional DC rounding.

    Behavioral counterpart of the reference's FMT_MJPEG trellis branch
    (mpegvideo_enc.c:4075); the lattice is ops/trellis.viterbi_rl.
    """
    from librempeg_tpu.ops.trellis import viterbi_rl

    x = plane.astype(jnp.float32) - 128.0
    coeffs = dct8x8.fdct(dct8x8.to_blocks(x)) \
        * jnp.asarray(_jpeg_scale(), jnp.float32)[None, :, :]
    zzc = coeffs.reshape(-1, 64)[:, jnp.asarray(T.ZIGZAG)]
    qt = qtab.reshape(-1)[jnp.asarray(T.ZIGZAG)] \
        .astype(jnp.float32)[None, :]
    mag = jnp.abs(zzc)
    l0 = jnp.round(mag / qt).astype(jnp.int32)
    cands = jnp.stack([jnp.clip(l0, 1, 1023),
                       jnp.clip(l0 - 1, 1, 1023)], axis=-1)
    dist_c = (cands.astype(jnp.float32) * qt[..., None]
              - mag[..., None]) ** 2
    bidx = jnp.int32(jnp.ceil(jnp.log2(cands.astype(jnp.float32) + 1)))
    b0, b1 = _ac_bits_tables(chroma)
    zz = viterbi_rl(zzc, cands, dist_c, bidx,
                    jnp.asarray(b0, jnp.float32),
                    jnp.asarray(b1, jnp.float32), lam, 1)
    dc = jnp.trunc(zzc[:, 0] / qt[0, 0]
                   + jnp.where(zzc[:, 0] >= 0, 0.5, -0.5)) \
        .astype(jnp.int32)
    return zz.at[:, 0].set(dc).astype(jnp.int16)


@functools.lru_cache(maxsize=None)
def _jpeg_scale() -> np.ndarray:
    """Orthonormal-DCT -> JPEG reference DCT scaling (x2 per axis, DC
    x sqrt(2)... net: jpeg_dct = ortho_dct * 8 / (c_k c_l) with
    c_0 = sqrt(2), c_k = 1 — fold as a per-coefficient matrix."""
    c = np.ones(8)
    c[0] = np.sqrt(2.0)
    # ortho basis includes sqrt(2/8) and DC 1/sqrt(2); JPEG fdct is
    # 1/4 * C(k) C(l) sum cos cos with C(0)=1/sqrt2: relation works out to
    # jpeg = ortho * 8 / (c_k * c_l) where c as above... verified in tests
    return 8.0 / np.outer(c, c) * 0 + _verify_scale()


def _verify_scale() -> np.ndarray:
    """Numerically derive the exact ortho->JPEG coefficient scaling."""
    rng = np.random.default_rng(0)
    # JPEG reference DCT: S(k,l)=1/4 C(k)C(l) sum x cos cos
    j = np.arange(8)
    cos = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / 16)
    cmat = np.ones(8)
    cmat[0] = 1 / np.sqrt(2)
    x = rng.standard_normal((8, 8))
    jpeg = 0.25 * np.outer(cmat, cmat) * (cos @ x @ cos.T)
    from librempeg_tpu.ops.dct8x8 import _ortho_basis

    B = _ortho_basis()
    ortho = B @ x @ B.T
    with np.errstate(divide="ignore", invalid="ignore"):
        s = jpeg / ortho
    s[~np.isfinite(s)] = 1.0
    return s.astype(np.float32)


def _dqt_segment(tid: int, q: np.ndarray) -> bytes:
    zz = q.reshape(-1)[T.ZIGZAG]
    return struct.pack(">HB", 2 + 1 + 64, tid) + bytes(
        int(v) for v in zz)


def _dht_segment(tc: int, th: int, bits: np.ndarray, vals: np.ndarray) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return struct.pack(">H", 2 + len(body)) + body


@register_encoder
class JpegEncoder(Encoder):
    INFO = CodecInfo(name="mjpeg", long_name="Motion JPEG / JPEG",
                     codec_type="video")
    OPTIONS = OptionTable(
        Option("quality", int, 90, alias="q", min=1, max=100),
        Option("trellis", int, 0, min=0, max=2,
               help="RD (trellis) AC coefficient quantization"),
    )

    def __init__(self, width=0, height=0, pix_fmt="yuvj420p", **opts):
        super().__init__(**opts)
        self.width, self.height = width, height
        self.pix_fmt = pix_fmt
        self.time_base = Rational(1, 25)
        self._next_pts = 0

    def codec_parameters(self):
        from librempeg_tpu.formats.api import CodecParameters

        return CodecParameters(
            codec_type="video", codec_id="mjpeg",
            width=self.width, height=self.height, pix_fmt=self.pix_fmt)

    def encode(self, frame: VideoFrame):
        data = encode_jpeg(frame, quality=self.opts["quality"])
        pts = frame.pts if frame.pts != NOPTS else self._next_pts
        self._next_pts = pts + 1
        return [Packet(data=data, pts=pts, dts=pts, duration=1,
                       flags=PktFlags.KEY, time_base=frame.time_base)]


def encode_jpeg(frame: VideoFrame, quality: int = 90,
                trellis: int = 0) -> bytes:
    """Encode one VideoFrame (yuvj420p/yuvj444p/yuv420p/gray) as JPEG."""
    if not native.available():
        raise Unsupported("native extension unavailable for JPEG encode")
    fmt = frame.format
    if fmt in ("yuvj420p", "yuv420p"):
        sampling = [(2, 2), (1, 1), (1, 1)]
    elif fmt in ("yuvj444p", "yuv444p"):
        sampling = [(1, 1), (1, 1), (1, 1)]
    elif fmt in ("yuvj422p", "yuv422p"):
        sampling = [(2, 1), (1, 1), (1, 1)]
    elif fmt == "gray":
        sampling = [(1, 1)]
    else:
        raise Unsupported(f"JPEG encode from {fmt}")
    ncomp = len(sampling)
    w, h = frame.width, frame.height
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    mcu_count = mcus_x * mcus_y

    lq = T.quant_for_quality(T.STD_LUMA_QUANT, quality)
    cq = T.quant_for_quality(T.STD_CHROMA_QUANT, quality)

    # per-component quantized zigzag blocks in raster block order
    comp_blocks = []
    for i in range(ncomp):
        ch, cv = sampling[i]
        nbx, nby = mcus_x * ch, mcus_y * cv
        plane = np.asarray(frame.planes[i])
        pad_h = nby * 8 - plane.shape[0]
        pad_w = nbx * 8 - plane.shape[1]
        if pad_h or pad_w:
            plane = np.pad(plane, ((0, pad_h), (0, pad_w)), mode="edge")
        q = lq if i == 0 else cq
        if trellis:
            # lambda follows the frame's quality point (the reference
            # scales its trellis lambda with qscale^2; our quality-
            # folded tables play that role)
            lam = 0.85 * float(np.mean(lq.reshape(-1)[1:])) ** 2
            zz = np.asarray(_plane_to_coeffs_rd(
                jnp.asarray(plane), jnp.asarray(q.reshape(-1)),
                jnp.float32(lam), i > 0))
        else:
            zz = np.asarray(_plane_to_coeffs(
                jnp.asarray(plane), jnp.asarray(q.reshape(-1))))
        comp_blocks.append((zz, nbx, nby, ch, cv))

    # interleave into MCU order
    blocks_per_mcu = sum(s[0] * s[1] for s in sampling)
    total = mcu_count * blocks_per_mcu
    inter = np.zeros((total, 64), np.int16)
    offset = 0
    for i, (zz, nbx, nby, ch, cv) in enumerate(comp_blocks):
        order = np.arange(nby * nbx).reshape(mcus_y, cv, mcus_x, ch
                                             ).transpose(0, 2, 1, 3).reshape(-1)
        dst = (np.arange(mcu_count)[:, None] * blocks_per_mcu + offset
               + np.arange(ch * cv)[None, :]).reshape(-1)
        inter[dst] = zz[order]
        offset += ch * cv

    cspec = [{"h": s[0], "v": s[1], "dc": 0 if i == 0 else 1,
              "ac": 0 if i == 0 else 1} for i, s in enumerate(sampling)]
    dct_tabs = [(T.DC_LUMA_BITS, T.DC_LUMA_VALS),
                (T.DC_CHROMA_BITS, T.DC_CHROMA_VALS)]
    act_tabs = [(T.AC_LUMA_BITS, T.AC_LUMA_VALS),
                (T.AC_CHROMA_BITS, T.AC_CHROMA_VALS)]
    scan = native.jpeg_encode_scan(inter, cspec, dct_tabs, act_tabs,
                                   mcu_count)

    # headers
    out = bytearray()
    out += b"\xFF\xD8"                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\0" + \
        bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += b"\xFF\xDB" + _dqt_segment(0, lq)
    if ncomp > 1:
        out += b"\xFF\xDB" + _dqt_segment(1, cq)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, sampling[i][0] << 4 | sampling[i][1],
                      0 if i == 0 else 1])
    out += b"\xFF\xC4" + _dht_segment(0, 0, T.DC_LUMA_BITS, T.DC_LUMA_VALS)
    out += b"\xFF\xC4" + _dht_segment(1, 0, T.AC_LUMA_BITS, T.AC_LUMA_VALS)
    if ncomp > 1:
        out += b"\xFF\xC4" + _dht_segment(0, 1, T.DC_CHROMA_BITS,
                                          T.DC_CHROMA_VALS)
        out += b"\xFF\xC4" + _dht_segment(1, 1, T.AC_CHROMA_BITS,
                                          T.AC_CHROMA_VALS)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0 if i == 0 else 0x11])
    out += bytes([0, 63, 0])
    out += scan
    out += b"\xFF\xD9"                       # EOI
    return bytes(out)
