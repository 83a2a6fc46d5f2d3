"""Regression tests for round-1 advisor findings (ADVICE.md).

- crafted JPEG with out-of-range/undefined Huffman tables must raise
  InvalidData, not corrupt memory (reference guards in mjpegdec.c)
- checkpoint snapshots are a data-only format (no pickle execution)
- Rational equality for den==0 operands (av_cmp_q semantics)
- ADTS demuxer reads incrementally (no 1 GiB slurp / silent truncation)
"""
import io
import struct

import numpy as np
import pytest

from librempeg_tpu.core.errors import InvalidData
from librempeg_tpu.core.rational import Rational


def _minimal_jpeg(td=0, ta=0, dht_bits=None, dht_vals=None):
    """Hand-build a tiny baseline JPEG (8x8 gray) with controllable
    Huffman table indices / table contents."""
    out = bytearray()
    out += b"\xff\xd8"                                  # SOI
    # DQT: table 0, all ones
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    # DHT: DC table 0 and AC table 0 (1 code of length 2 -> symbol 0)
    if dht_bits is None:
        dht_bits = bytes([0, 1] + [0] * 14)
    if dht_vals is None:
        dht_vals = bytes([0])
    for tc in (0, 1):
        seg = bytes([tc << 4]) + dht_bits + dht_vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    # SOF0: 8-bit 8x8, 1 component, 1x1 sampling, qtable 0
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # SOS: 1 component, DC/AC table indices under test
    sos = bytes([1, 1, (td << 4) | ta, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += b"\x55" * 16                                  # entropy data
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


class TestJpegHardening:
    def _decode(self, data):
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg

        return decode_jpeg(data)

    def test_out_of_range_table_index_rejected(self):
        # Td=Ta=15 used to index 4-element stack arrays -> segfault
        with pytest.raises(InvalidData):
            self._decode(_minimal_jpeg(td=15, ta=15))

    def test_undefined_table_rejected(self):
        # indices in range but tables 2/3 never defined
        with pytest.raises(InvalidData):
            self._decode(_minimal_jpeg(td=2, ta=3))

    def test_overlong_bits_table_rejected(self):
        # sum(bits) > len(vals): would read past the values array
        bits = bytes([255, 255] + [0] * 14)
        with pytest.raises(InvalidData):
            self._decode(_minimal_jpeg(dht_bits=bits, dht_vals=bytes([0])))

    def test_valid_stream_still_decodes(self):
        from librempeg_tpu.codecs.jpeg.encoder import encode_jpeg
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg
        from librempeg_tpu.core.frame import VideoFrame

        rng = np.random.default_rng(7)
        y = rng.integers(0, 256, (32, 32), np.uint8)
        frame = VideoFrame(planes=(y,), format="gray", width=32,
                           height=32, color_range="jpeg")
        blob = encode_jpeg(frame, quality=90)
        out = decode_jpeg(blob)
        assert out.width == 32 and out.height == 32


class TestCheckpointFormat:
    def test_roundtrip_data_only(self):
        from librempeg_tpu.sched.checkpoint import dumps_state, loads_state

        state = {"demux_pos": 42,
                 "chains": {0: {"frames_done": 3,
                                "encoder": {"_hist": np.arange(6.0),
                                            "_pend": np.zeros((2, 0))},
                                "resamplers": [None]}},
                 "t": (1, 2.5, "x", None, True)}
        out = loads_state(dumps_state(state))
        assert out["demux_pos"] == 42
        assert out["chains"][0]["frames_done"] == 3
        np.testing.assert_array_equal(
            out["chains"][0]["encoder"]["_hist"], np.arange(6.0))
        assert out["t"] == (1, 2.5, "x", None, True)

    def test_rejects_pickle_blob(self):
        import pickle

        from librempeg_tpu.sched.checkpoint import loads_state

        evil = pickle.dumps({"demux_pos": 0})
        with pytest.raises(ValueError):
            loads_state(evil)

    def test_no_code_execution_surface(self):
        # the serialized form must not contain pickle opcodes at all
        from librempeg_tpu.sched.checkpoint import dumps_state

        blob = dumps_state({"a": np.ones(3)})
        assert blob.startswith(b"LTCKPT1\n")
        assert b"c__builtin__" not in blob and b"R." not in blob[:64]


class TestRationalInfinity:
    def test_equal_infinities(self):
        assert Rational(1, 0) == Rational(1, 0)
        assert Rational(2, 0) == Rational(5, 0)      # both +inf reduce equal
        assert Rational(-1, 0) == Rational(-3, 0)
        assert Rational(1, 0) != Rational(-1, 0)

    def test_hash_consistent(self):
        assert hash(Rational(1, 0)) == hash(Rational(2, 0)) or \
            Rational(1, 0) != Rational(2, 0)


class TestAdtsIncremental:
    def _frame(self, payload=b"\x00" * 13):
        ln = 7 + len(payload)
        hdr = bytes([0xFF, 0xF1, (1 << 6) | (4 << 2), (2 & 3) << 6 |
                     ((ln >> 11) & 3), (ln >> 3) & 0xFF,
                     ((ln & 7) << 5) | 0x1F, 0xFC])
        return hdr + payload

    def test_streams_incrementally(self):
        from librempeg_tpu.formats.adts import AdtsDemuxer
        from librempeg_tpu.core.errors import EndOfStream

        class CountingIO(io.BytesIO):
            max_read = 0

            def read(self, n=-1):
                CountingIO.max_read = max(CountingIO.max_read, n)
                return super().read(n)

        data = self._frame() * 100
        d = AdtsDemuxer()
        d.read_header(CountingIO(data))
        n = 0
        while True:
            try:
                pkt = d.read_packet()
            except EndOfStream:
                break
            assert len(pkt.data) == 20
            n += 1
        assert n == 100
        assert CountingIO.max_read <= 1 << 16   # no giant slurp

    def test_garbage_prefix_resync(self):
        from librempeg_tpu.formats.adts import AdtsDemuxer

        data = b"\x00garbage\xff\x00" + self._frame() * 3
        d = AdtsDemuxer()
        d.read_header(io.BytesIO(data))
        assert len(d.read_packet().data) == 20
