"""Matroska/WebM demuxer.

Analog of /root/reference/libavformat/matroskadec.c (EBML parse, Tracks,
Clusters with SimpleBlock/BlockGroup, all three lacing modes).
"""
from __future__ import annotations

import struct

from librempeg_tpu.core.errors import EndOfStream, InvalidData, Unsupported
from librempeg_tpu.core.packet import Packet, PktFlags
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.formats.api import (
    PROBE_SCORE_MAX,
    CodecParameters,
    Demuxer,
    Stream,
    register_demuxer,
)

# EBML element IDs (core subset)
_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_BIT_DEPTH = 0x6264
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

_CODEC_IDS = {
    "V_MPEG4/ISO/ASP": "mpeg4",
    "V_MPEG4/ISO/SP": "mpeg4",
    "V_MPEG4/ISO/AVC": "h264",
    "V_MJPEG": "mjpeg",
    "V_UNCOMPRESSED": "rawvideo",
    "A_AAC": "aac",
    "A_FLAC": "flac",
    "A_PCM/INT/LIT": "pcm_s16le",
    "A_PCM/FLOAT/IEEE": "pcm_f32le",
}


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at pos -> (value, new_pos)."""
    if pos >= len(data):
        raise EndOfStream
    b0 = data[pos]
    if b0 == 0:
        raise InvalidData("mkv: invalid vint")
    length = 1
    mask = 0x80
    while not (b0 & mask):
        length += 1
        mask >>= 1
    v = b0 if keep_marker else (b0 & (mask - 1))
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


class _Element:
    __slots__ = ("eid", "start", "end")


def _iter_elements(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        yield eid, pos, min(pos + size, end)
        pos += size


def _uint(data: bytes) -> int:
    v = 0
    for b in data:
        v = (v << 8) | b
    return v


def _float(data: bytes) -> float:
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    return 0.0


@register_demuxer
class MatroskaDemuxer(Demuxer):
    NAME = "matroska"
    LONG_NAME = "Matroska / WebM"
    EXTENSIONS = ("mkv", "webm", "mka")

    @classmethod
    def probe(cls, buf: bytes, filename: str = "") -> int:
        return PROBE_SCORE_MAX if buf.startswith(b"\x1aE\xdf\xa3") else 0

    def read_header(self, io):
        data = io.read(1 << 30)  # whole file (seekable stream model)
        self._data = data
        self.timescale = 1_000_000  # ns per tick
        self._track_map: dict[int, int] = {}
        pos = 0
        segment_range = None
        for eid, s, e in _iter_elements(data, 0, len(data)):
            if eid == _SEGMENT:
                segment_range = (s, e)
                break
        if segment_range is None:
            raise InvalidData("mkv: no Segment")
        self._blocks: list[tuple[int, int, int, bytes]] = []
        for eid, s, e in _iter_elements(data, *segment_range):
            if eid == _INFO:
                for eid2, s2, e2 in _iter_elements(data, s, e):
                    if eid2 == _TIMESTAMP_SCALE:
                        self.timescale = _uint(data[s2:e2])
            elif eid == _TRACKS:
                self._parse_tracks(data, s, e)
            elif eid == _CLUSTER:
                self._parse_cluster(data, s, e)
        self._cursor = 0

    def _parse_tracks(self, data, s, e):
        for eid, ts, te in _iter_elements(data, s, e):
            if eid != _TRACK_ENTRY:
                continue
            num = 0
            ttype = 0
            codec = ""
            private = b""
            w = h = 0
            rate = 0
            channels = 0
            for eid2, s2, e2 in _iter_elements(data, ts, te):
                if eid2 == _TRACK_NUMBER:
                    num = _uint(data[s2:e2])
                elif eid2 == _TRACK_TYPE:
                    ttype = _uint(data[s2:e2])
                elif eid2 == _CODEC_ID:
                    codec = data[s2:e2].decode("ascii", "replace")
                elif eid2 == _CODEC_PRIVATE:
                    private = data[s2:e2]
                elif eid2 == _VIDEO:
                    for eid3, s3, e3 in _iter_elements(data, s2, e2):
                        if eid3 == _PIXEL_WIDTH:
                            w = _uint(data[s3:e3])
                        elif eid3 == _PIXEL_HEIGHT:
                            h = _uint(data[s3:e3])
                elif eid2 == _AUDIO:
                    for eid3, s3, e3 in _iter_elements(data, s2, e2):
                        if eid3 == _SAMPLING_FREQ:
                            rate = int(_float(data[s3:e3]))
                        elif eid3 == _CHANNELS:
                            channels = _uint(data[s3:e3])
            cid = _CODEC_IDS.get(codec)
            if cid is None:
                continue
            if ttype == 1:
                par = CodecParameters(codec_type="video", codec_id=cid,
                                      width=w, height=h,
                                      pix_fmt="yuv420p",
                                      extradata=bytes(private))
            elif ttype == 2:
                par = CodecParameters(codec_type="audio", codec_id=cid,
                                      sample_rate=rate or 48000,
                                      nb_channels=channels or 2,
                                      extradata=bytes(private))
            else:
                continue
            st = Stream(index=len(self.streams), codecpar=par,
                        time_base=Rational(self.timescale, 1_000_000_000))
            self._track_map[num] = st.index
            self.streams.append(st)

    def _parse_cluster(self, data, s, e):
        cluster_ts = 0
        for eid, s2, e2 in _iter_elements(data, s, e):
            if eid == _CLUSTER_TS:
                cluster_ts = _uint(data[s2:e2])
            elif eid == _SIMPLE_BLOCK:
                self._parse_block(data, s2, e2, cluster_ts, key_known=True)
            elif eid == _BLOCK_GROUP:
                for eid3, s3, e3 in _iter_elements(data, s2, e2):
                    if eid3 == _BLOCK:
                        self._parse_block(data, s3, e3, cluster_ts,
                                          key_known=False)

    def _parse_block(self, data, s, e, cluster_ts, key_known):
        track, pos = _read_vint(data, s, keep_marker=False)
        rel_ts = struct.unpack(">h", data[pos:pos + 2])[0]
        flags = data[pos + 2]
        pos += 3
        lacing = (flags >> 1) & 3
        key = bool(flags & 0x80) if key_known else True
        frames: list[bytes] = []
        if lacing == 0:
            frames = [data[pos:e]]
        else:
            nframes = data[pos] + 1
            pos += 1
            sizes = []
            if lacing == 2:      # fixed
                total = e - pos
                sizes = [total // nframes] * nframes
            elif lacing == 1:    # Xiph
                for _ in range(nframes - 1):
                    sz = 0
                    while True:
                        b = data[pos]
                        pos += 1
                        sz += b
                        if b != 255:
                            break
                    sizes.append(sz)
                sizes.append(e - pos - sum(sizes))
            else:                # EBML lacing
                first, pos = _read_vint(data, pos, keep_marker=False)
                sizes = [first]
                for _ in range(nframes - 2):
                    dv, pos = _read_vint(data, pos, keep_marker=False)
                    nbits = dv.bit_length()
                    # signed delta: subtract range midpoint
                    length = (nbits + 6) // 7
                    dv -= (1 << (7 * length - 1)) - 1
                    sizes.append(sizes[-1] + dv)
                sizes.append(e - pos - sum(sizes))
            for sz in sizes:
                frames.append(data[pos:pos + sz])
                pos += sz
        ts = cluster_ts + rel_ts
        for i, f in enumerate(frames):
            self._blocks.append((ts + i, track, 1 if key else 0, f))

    def read_packet(self) -> Packet:
        if self._cursor >= len(self._blocks):
            raise EndOfStream
        ts, track, key, payload = self._blocks[self._cursor]
        self._cursor += 1
        sidx = self._track_map.get(track)
        if sidx is None:
            return self.read_packet()
        st = self.streams[sidx]
        return Packet(data=payload, pts=ts, dts=ts, duration=0,
                      stream_index=sidx,
                      flags=PktFlags.KEY if key else 0,
                      time_base=st.time_base)
