"""GIF codec/container tests."""
import numpy as np
import pytest

from librempeg_tpu.codecs.gif import lzw_decode, lzw_encode, make_palette, quantize
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import (
    CodecParameters,
    open_input_bytes,
    open_output_bytes,
)
from librempeg_tpu.utils import testgen


class TestLzw:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip_random(self, seed):
        rng = np.random.default_rng(seed)
        data = rng.integers(0, 256, 5000).astype(np.uint8)
        enc = lzw_encode(data, 8)
        dec = lzw_decode(enc, 8, len(data))
        np.testing.assert_array_equal(dec, data)

    def test_roundtrip_repetitive(self):
        data = np.tile(np.arange(16, dtype=np.uint8), 1000)
        enc = lzw_encode(data, 8)
        assert len(enc) < len(data) // 2  # compresses
        dec = lzw_decode(enc, 8, len(data))
        np.testing.assert_array_equal(dec, data)


class TestGifContainer:
    def _mux(self, frames, w, h):
        mux = open_output_bytes("gif")
        mux.add_stream(CodecParameters(
            codec_type="video", codec_id="rawvideo", width=w, height=h,
            pix_fmt="rgb24"), time_base=Rational(1, 100))
        for i, f in enumerate(frames):
            mux.write(Packet(data=f.tobytes(), pts=i * 10, dts=i * 10,
                             duration=10, time_base=Rational(1, 100)))
        mux.finish()
        return mux.io.getvalue()

    def test_roundtrip(self):
        frames = [testgen.video_rgb(48, 32, i) for i in range(3)]
        blob = self._mux(frames, 48, 32)
        assert blob.startswith(b"GIF89a")
        d = open_input_bytes(blob)
        assert d.NAME == "gif"
        par = d.streams[0].codecpar
        assert (par.width, par.height) == (48, 32)
        pkts = list(d.packets())
        assert len(pkts) == 3
        got = np.frombuffer(pkts[0].data, np.uint8).reshape(32, 48, 3)
        # palette quantization: tolerate the 6x7x6 cube's step size
        err = np.abs(got.astype(int) - frames[0].astype(int))
        assert err.mean() < 30

    def test_solid_color_exact_palette_entry(self):
        pal = make_palette()
        frame = np.zeros((16, 16, 3), np.uint8)
        frame[:] = pal[100]
        blob = self._mux([frame], 16, 16)
        d = open_input_bytes(blob)
        pkts = list(d.packets())
        got = np.frombuffer(pkts[0].data, np.uint8).reshape(16, 16, 3)
        np.testing.assert_array_equal(got, frame)
