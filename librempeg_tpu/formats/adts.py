"""ADTS (AAC transport) demuxer + muxer.

Analog of /root/reference/libavformat/aacdec.c (probe: consecutive
0xFFF-sync frames with sane lengths) and adtsenc.c (the encoder already
emits ADTS headers, so muxing is passthrough; raw AAC packets get a
header built from codec parameters).
"""
from __future__ import annotations

from librempeg_tpu.core.errors import EndOfStream, InvalidData
from librempeg_tpu.core.packet import Packet, PktFlags
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import (
    CodecParameters,
    Demuxer,
    Muxer,
    Stream,
    register_demuxer,
    register_muxer,
)

_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
          16000, 12000, 11025, 8000, 7350)


def _frame_len(data: bytes, pos: int) -> int:
    return ((data[pos + 3] & 3) << 11) | (data[pos + 4] << 3) \
        | (data[pos + 5] >> 5)


def _is_sync(data: bytes, pos: int) -> bool:
    return (pos + 7 <= len(data) and data[pos] == 0xFF
            and (data[pos + 1] & 0xF6) == 0xF0)


@register_demuxer
class AdtsDemuxer(Demuxer):
    NAME = "aac"
    LONG_NAME = "raw ADTS AAC"
    EXTENSIONS = ("aac", "adts")

    @classmethod
    def probe(cls, buf: bytes, filename: str = "") -> int:
        pos = 0
        frames = 0
        while _is_sync(buf, pos) and frames < 3:
            ln = _frame_len(buf, pos)
            if ln < 7:
                return 0
            frames += 1
            pos += ln
        if frames >= 2 or (frames == 1 and pos >= len(buf)):
            return 51
        return 0

    def read_header(self, io):
        data = io.read(1 << 30)
        pos = 0
        while pos < len(data) and not _is_sync(data, pos):
            pos += 1
        if not _is_sync(data, pos):
            raise InvalidData("adts: no sync")
        rate_idx = (data[pos + 2] >> 2) & 0xF
        channels = ((data[pos + 2] & 1) << 2) | (data[pos + 3] >> 6)
        rate = _RATES[rate_idx] if rate_idx < len(_RATES) else 44100
        self._frames = []
        while _is_sync(data, pos):
            ln = _frame_len(data, pos)
            if ln < 7 or pos + ln > len(data):
                break
            self._frames.append(data[pos:pos + ln])
            pos += ln
        if not self._frames:
            raise InvalidData("adts: no frames")
        par = CodecParameters(codec_type="audio", codec_id="aac",
                              sample_rate=rate, nb_channels=channels or 2,
                              frame_size=1024)
        self.streams = [Stream(index=0, codecpar=par,
                               time_base=Rational(1, rate))]
        self._idx = 0

    def read_packet(self) -> Packet:
        if self._idx >= len(self._frames):
            raise EndOfStream
        i = self._idx
        self._idx += 1
        return Packet(data=self._frames[i], pts=i * 1024, dts=i * 1024,
                      duration=1024, flags=PktFlags.KEY,
                      time_base=self.streams[0].time_base)


@register_muxer
class AdtsMuxer(Muxer):
    NAME = "adts"
    LONG_NAME = "ADTS AAC"
    EXTENSIONS = ("aac", "adts")
    INTERLEAVE = False

    def write_packet(self, pkt: Packet):
        data = bytes(pkt.data)
        if not _is_sync(data, 0):    # raw AAC: synthesize the header
            par = self.streams[pkt.stream_index].codecpar
            ln = len(data) + 7
            ri = _RATES.index(par.sample_rate) \
                if par.sample_rate in _RATES else 4
            ch = par.nb_channels
            hdr = bytes([
                0xFF, 0xF1, (1 << 6) | (ri << 2) | (ch >> 2),
                ((ch & 3) << 6) | ((ln >> 11) & 3),
                (ln >> 3) & 0xFF, ((ln & 7) << 5) | 0x1F, 0xFC])
            data = hdr + data
        self.io.write(data)
