"""AAC-LC decoder (long windows).

Analog of /root/reference/libavcodec/aac/aacdec.c reduced to the same
feature point as our encoder: ADTS framing, SCE/CPE with ONLY_LONG
windows, sine/KBD window shapes, all spectral codebooks 1-11 (+ESC),
scalefactor delta decoding, inverse quant, device IMDCT + overlap-add.
TNS/PNS/MS and EIGHT_SHORT sequences are round-2 scope (rejected
explicitly, not silently).
"""
from __future__ import annotations

import numpy as np

from librempeg_tpu.codecs.aac import tables_data as T
from librempeg_tpu.codecs.api import CodecInfo, Decoder, register_decoder
from librempeg_tpu.codecs.flac.bitio import BitReaderMSB
from librempeg_tpu.core.errors import InvalidData, Unsupported
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.core.samplefmt import ChannelLayout
from librempeg_tpu.ops import tx

FRAME = 1024
SF_OFFSET = 100


class _Vlc:
    def __init__(self, codes, bits):
        self.lut = {}
        self.max_len = 0
        for i, (c, ln) in enumerate(zip(codes, bits)):
            self.lut[(ln, c)] = i
            self.max_len = max(self.max_len, ln)

    def read(self, br: BitReaderMSB) -> int:
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise InvalidData("AAC: invalid huffman code")


_SCF_VLC = _Vlc(T.SCF_CODES, T.SCF_BITS)
_SPEC_VLC = [_Vlc(T.SPECTRAL_CODES[i], T.SPECTRAL_BITS[i])
             for i in range(11)]

# codebook properties: (dimension, LAV, signed)
_CB_PROPS = {1: (4, 1, True), 2: (4, 1, True), 3: (4, 2, False),
             4: (4, 2, False), 5: (2, 4, True), 6: (2, 4, True),
             7: (2, 7, False), 8: (2, 7, False), 9: (2, 12, False),
             10: (2, 12, False), 11: (2, 16, False)}


def _decode_cb_values(br: BitReaderMSB, cb: int, n: int) -> np.ndarray:
    """Decode n spectral values with codebook cb."""
    dim, lav, signed = _CB_PROPS[cb]
    vlc = _SPEC_VLC[cb - 1]
    mod = 2 * lav + 1 if signed else lav + 1
    off = lav if signed else 0
    out = np.zeros(n, np.int64)
    i = 0
    while i < n:
        idx = vlc.read(br)
        vals = []
        for d in range(dim - 1, -1, -1):
            vals.append((idx // (mod ** d)) % mod - off)
        if not signed:
            for k in range(dim):
                if vals[k]:
                    if br.read(1):
                        vals[k] = -vals[k]
        if cb == 11:
            for k in range(dim):
                if abs(vals[k]) == 16:
                    nbits = 4
                    while br.read(1):
                        nbits += 1
                    esc = br.read(nbits)
                    mag = (1 << nbits) + esc
                    vals[k] = -mag if vals[k] < 0 else mag
        out[i:i + dim] = vals[:n - i]
        i += dim
    return out


def _parse_ics_info(br: BitReaderMSB):
    br.read(1)                    # ics_reserved
    seq = br.read(2)
    if seq == 2:
        raise Unsupported("AAC: EIGHT_SHORT windows (round-2)")
    shape = br.read(1)
    max_sfb = br.read(6)
    if br.read(1):
        raise Unsupported("AAC: predictor data")
    return seq, shape, max_sfb


def _decode_ics(br: BitReaderMSB, global_gain: int, max_sfb: int,
                swb: list[int]) -> np.ndarray:
    nbands = max_sfb
    # section data
    cbs = np.zeros(nbands, np.int32)
    b = 0
    while b < nbands:
        cb = br.read(4)
        run = 0
        while True:
            r = br.read(5)
            run += r
            if r != 31:
                break
        for i in range(b, min(b + run, nbands)):
            cbs[i] = cb
        b += run
        if run == 0:
            raise InvalidData("AAC: zero-length section")
    # scalefactors: DPCM from global_gain; EVERY coded band reads a
    # delta (the first is typically +0)
    sfs = np.zeros(nbands, np.int32)
    sf = global_gain
    for i in range(nbands):
        if cbs[i] == 0:
            continue
        if cbs[i] in (13, 14, 15):
            raise Unsupported("AAC: PNS/intensity stereo")
        sf += _SCF_VLC.read(br) - 60
        sfs[i] = sf
    # pulse/tns/gain
    if br.read(1):
        raise Unsupported("AAC: pulse data")
    if br.read(1):
        raise Unsupported("AAC: TNS (round-2)")
    if br.read(1):
        raise Unsupported("AAC: gain control")
    # spectral data
    spec = np.zeros(FRAME, np.float64)
    for i in range(nbands):
        lo, hi = swb[i], swb[i + 1]
        cb = int(cbs[i])
        if cb == 0:
            continue
        q = _decode_cb_values(br, cb, hi - lo)
        step = 2.0 ** ((int(sfs[i]) - SF_OFFSET) / 4.0)
        spec[lo:hi] = np.sign(q) * np.abs(q).astype(np.float64) ** (4 / 3) \
            * step
    return spec


class AacFrameDecoder:
    def __init__(self):
        self.overlap: dict[int, np.ndarray] = {}
        self.rate = 44100
        self.channels = 2

    def decode_adts(self, data: bytes):
        if len(data) < 7 or data[0] != 0xFF or (data[1] & 0xF0) != 0xF0:
            raise InvalidData("AAC: bad ADTS sync")
        no_crc = data[1] & 1
        rate_idx = (data[2] >> 2) & 0xF
        channels = ((data[2] & 1) << 2) | (data[3] >> 6)
        self.rate = T.SAMPLE_RATES[rate_idx]
        self.channels = channels
        hdr = 7 if no_crc else 9
        br = BitReaderMSB(data[hdr:])
        swb = list(T.SWB_OFFSET_1024[rate_idx])
        if swb[-1] != FRAME:
            swb = swb + [FRAME]
        return self._raw_data_block(br, swb)

    def _raw_data_block(self, br: BitReaderMSB, swb):
        specs = []
        while True:
            ele = br.read(3)
            if ele == 7:              # END
                break
            br.read(4)                # instance tag
            if ele == 0:              # SCE
                gg = br.read(8)
                seq, shape, max_sfb = _parse_ics_info(br)
                specs.append(_decode_ics(br, gg, max_sfb, swb))
            elif ele == 1:            # CPE
                common = br.read(1)
                if not common:
                    raise Unsupported("AAC: CPE without common_window")
                seq, shape, max_sfb = _parse_ics_info(br)
                ms = br.read(2)
                n_sfb = max_sfb
                ms_mask = None
                if ms == 1:
                    ms_mask = [br.read(1) for _ in range(n_sfb)]
                elif ms == 2:
                    ms_mask = [1] * n_sfb
                gg0 = br.read(8)
                s0 = _decode_ics(br, gg0, max_sfb, swb)
                gg1 = br.read(8)
                s1 = _decode_ics(br, gg1, max_sfb, swb)
                if ms_mask:
                    for i in range(n_sfb):
                        if ms_mask[i]:
                            lo, hi = swb[i], swb[i + 1]
                            m = s0[lo:hi].copy()
                            s = s1[lo:hi].copy()
                            s0[lo:hi] = m + s
                            s1[lo:hi] = m - s
                specs.append(s0)
                specs.append(s1)
            else:
                raise Unsupported(f"AAC: element type {ele}")
        # IMDCT + window + overlap-add
        import jax.numpy as jnp

        win = tx.sine_window(2 * FRAME)
        out = np.zeros((len(specs), FRAME), np.float32)
        for c, spec in enumerate(specs):
            t = np.asarray(tx.imdct(jnp.asarray(spec[None, :],
                                                jnp.float32)))[0]
            t = t * win
            prev = self.overlap.get(c, np.zeros(FRAME))
            out[c] = (prev + t[:FRAME]) / 2.0
            self.overlap[c] = t[FRAME:]
        return out / 32768.0


@register_decoder
class AacDecoder(Decoder):
    INFO = CodecInfo(name="aac", long_name="AAC (Advanced Audio Coding) LC",
                     codec_type="audio")

    def __init__(self, params=None, **opts):
        self._dec = AacFrameDecoder()
        self._pts = 0
        super().__init__(params, **opts)

    def decode(self, pkt: Packet):
        pcm = self._dec.decode_adts(bytes(pkt.data))
        f = AudioFrame(
            data=pcm, sample_rate=self._dec.rate, sample_fmt="fltp",
            layout=ChannelLayout.default(pcm.shape[0]),
            pts=pkt.pts if pkt.pts >= 0 else self._pts,
            time_base=Rational(1, self._dec.rate))
        self._pts += FRAME
        return [f]
