"""PCM codec family: raw sample (de)serialization.

Analog of /root/reference/libavcodec/pcm.c (pcm_s16le/s24le/s32le/f32le/
u8/alaw/mulaw decoders+encoders). Host-side numpy — PCM is pure data
movement; frames land as [channels, samples] planar arrays ready for
device upload.
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
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.packet import Packet, PktFlags
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.core.samplefmt import ChannelLayout


def _alaw_table() -> np.ndarray:
    """A-law byte -> s16 decode table (ITU-T G.711)."""
    out = np.zeros(256, np.int16)
    for a in range(256):
        v = a ^ 0x55
        t = (v & 0x0F) << 4
        seg = (v & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[a] = t if v & 0x80 else -t  # sign bit set -> positive
    return out


def _mulaw_table() -> np.ndarray:
    """mu-law byte -> s16 decode table (ITU-T G.711)."""
    out = np.zeros(256, np.int16)
    for u in range(256):
        v = ~u & 0xFF
        seg = (v >> 4) & 0x07
        mant = v & 0x0F
        val = ((mant << 3) + 0x84) << seg
        val -= 0x84
        out[u] = -val if v & 0x80 else val
    return out


_PCM_SPECS: dict[str, dict] = {
    "pcm_u8": dict(dtype="u1", bits=8),
    "pcm_s16le": dict(dtype="<i2", bits=16),
    "pcm_s16be": dict(dtype=">i2", bits=16),
    "pcm_s24le": dict(dtype=None, bits=24),
    "pcm_s32le": dict(dtype="<i4", bits=32),
    "pcm_s32be": dict(dtype=">i4", bits=32),
    "pcm_f32le": dict(dtype="<f4", bits=32),
    "pcm_f32be": dict(dtype=">f4", bits=32),
    "pcm_f64le": dict(dtype="<f8", bits=64),
    "pcm_alaw": dict(dtype="u1", bits=8, table=_alaw_table),
    "pcm_mulaw": dict(dtype="u1", bits=8, table=_mulaw_table),
}

_SAMPLE_FMT = {
    "pcm_u8": "u8", "pcm_s16le": "s16", "pcm_s16be": "s16",
    "pcm_s24le": "s32", "pcm_s32le": "s32", "pcm_s32be": "s32",
    "pcm_f32le": "flt", "pcm_f32be": "flt", "pcm_f64le": "dbl",
    "pcm_alaw": "s16", "pcm_mulaw": "s16",
}


def _decode_bytes(codec: str, data: bytes, channels: int) -> np.ndarray:
    """bytes -> [channels, samples] array in the codec's native width."""
    spec = _PCM_SPECS[codec]
    if codec == "pcm_s24le":
        raw = np.frombuffer(data, np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.uint32)
        v = raw[:, 0] | raw[:, 1] << 8 | raw[:, 2] << 16
        v = v.astype(np.int32)
        v = (v << 8) >> 8  # sign extend 24 -> 32
        flat = v
    else:
        flat = np.frombuffer(data, spec["dtype"])
        if "table" in spec:
            flat = spec["table"]()[flat]
    n = len(flat) - len(flat) % channels
    return np.ascontiguousarray(flat[:n].reshape(-1, channels).T)


def _encode_array(codec: str, samples: np.ndarray) -> bytes:
    """[channels, samples] -> interleaved bytes in the codec's width."""
    spec = _PCM_SPECS[codec]
    inter = np.ascontiguousarray(samples.T)
    if codec == "pcm_s24le":
        v = inter.astype(np.int32).reshape(-1)
        b = np.zeros((len(v), 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        return b.tobytes()
    if "table" in spec:
        raise NotImplementedError(f"{codec} encoding")
    return inter.astype(spec["dtype"]).tobytes()


def _make_decoder(codec_name: str):
    class PcmDecoder(Decoder):
        INFO = CodecInfo(name=codec_name, long_name=f"PCM {codec_name[4:]}",
                         codec_type="audio")

        def configure(self, params):
            self.sample_rate = params.sample_rate
            self.channels = params.nb_channels

        def decode(self, pkt: Packet):
            data = _decode_bytes(codec_name, pkt.data, self.channels)
            return [AudioFrame(
                data=data,
                sample_rate=self.sample_rate,
                sample_fmt=_SAMPLE_FMT[codec_name] + "p",
                layout=ChannelLayout.default(self.channels),
                pts=pkt.pts,
                time_base=pkt.time_base if pkt.time_base.valid and pkt.time_base.num
                else Rational(1, self.sample_rate),
            )]

    PcmDecoder.__name__ = f"PcmDecoder_{codec_name}"
    return register_decoder(PcmDecoder)


def _make_encoder(codec_name: str):
    class PcmEncoder(Encoder):
        INFO = CodecInfo(name=codec_name, long_name=f"PCM {codec_name[4:]}",
                         codec_type="audio")

        def __init__(self, sample_rate=48000, channels=2, **opts):
            super().__init__(**opts)
            self.sample_rate = sample_rate
            self.channels = channels
            self.time_base = Rational(1, sample_rate)
            self._next_pts = 0

        def codec_parameters(self):
            from librempeg_tpu.formats.api import CodecParameters

            bits = _PCM_SPECS[codec_name]["bits"]
            return CodecParameters(
                codec_type="audio",
                codec_id=codec_name,
                sample_rate=self.sample_rate,
                nb_channels=self.channels,
                block_align=self.channels * (bits // 8),
                bit_rate=self.sample_rate * self.channels * bits,
            )

        def encode(self, frame: AudioFrame):
            x = np.asarray(frame.data)
            spec = _PCM_SPECS[codec_name]
            if np.issubdtype(x.dtype, np.floating) and not np.issubdtype(
                    np.dtype(spec["dtype"]), np.floating):
                # float [-1,1) planar -> integer target (swr semantics);
                # astype() alone would truncate everything to silence
                x = from_float(x.astype(np.float32),
               codec_name[4:].replace("le", "").replace("be", ""))
            elif (np.issubdtype(np.dtype(spec["dtype"]), np.floating)
                    and not np.issubdtype(x.dtype, np.floating)):
                x = to_float(x, frame.sample_fmt)
            data = _encode_array(codec_name, x)
            pts = frame.pts if frame.pts != NOPTS else self._next_pts
            self._next_pts = pts + frame.nb_samples
            return [Packet(
                data=data, pts=pts, dts=pts, duration=frame.nb_samples,
                flags=PktFlags.KEY, time_base=Rational(1, frame.sample_rate),
            )]

    PcmEncoder.__name__ = f"PcmEncoder_{codec_name}"
    return register_encoder(PcmEncoder)


for _name in _PCM_SPECS:
    _make_decoder(_name)
    if "table" not in _PCM_SPECS[_name]:
        _make_encoder(_name)


# -- sample format conversion helpers (samplefmt/audioconvert analog) -------

def to_float(samples: np.ndarray, sample_fmt: str) -> np.ndarray:
    """Convert any integer/float PCM array to float32 in [-1, 1).

    Scaling matches the reference's audioconvert conventions:
    s16/2^15, s32/2^31, u8 offset-binary.
    """
    base = sample_fmt.rstrip("p")
    if base in ("flt", "dbl"):
        return samples.astype(np.float32)
    if base == "s16":
        return samples.astype(np.float32) / 32768.0
    if base == "s32":
        return samples.astype(np.float32) / 2147483648.0
    if base == "u8":
        return (samples.astype(np.float32) - 128.0) / 128.0
    raise ValueError(f"unknown sample format {sample_fmt}")


def from_float(samples: np.ndarray, sample_fmt: str,
               dither: np.ndarray | None = None) -> np.ndarray:
    """float32 [-1,1) -> target format with round-to-nearest + clip
    (swresample's float->int conversion semantics; optional TPDF dither
    values in LSBs added before rounding)."""
    base = sample_fmt.rstrip("p")
    if base in ("flt",):
        return samples.astype(np.float32)
    if base == "dbl":
        return samples.astype(np.float64)
    if base == "s16":
        x = samples * 32768.0
        if dither is not None:
            x = x + dither
        return np.clip(np.rint(x), -32768, 32767).astype(np.int16)
    if base == "s32":
        x = samples * 2147483648.0
        if dither is not None:
            x = x + dither
        return np.clip(np.rint(x), -2147483648, 2147483647).astype(np.int64).astype(np.int32)
    if base == "u8":
        x = samples * 128.0 + 128.0
        return np.clip(np.rint(x), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown sample format {sample_fmt}")
