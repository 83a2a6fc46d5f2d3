"""Robustness tests: corrupted inputs must raise clean errors, never
crash/hang (the tools/trasher.c + fuzzer-target tier, SURVEY.md §4/5),
plus SRT subtitle roundtrip."""
import numpy as np
import pytest

from librempeg_tpu.codecs.bsf import find_bsf
from librempeg_tpu.core.errors import MediaError
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.formats.api import open_input_bytes, open_output_bytes
from librempeg_tpu.utils import testgen


def trash(data: bytes, seed: int, n_hits: int = 20) -> bytes:
    rng = np.random.default_rng(seed)
    buf = bytearray(data)
    for _ in range(n_hits):
        i = int(rng.integers(0, len(buf)))
        buf[i] = int(rng.integers(0, 256))
    return bytes(buf)


def _expect_clean(fn):
    """Run fn; anything other than a MediaError-family failure (or clean
    success) is a robustness bug."""
    try:
        fn()
    except MediaError:
        pass
    except (ValueError, KeyError, IndexError, struct_error, EOFError):
        pass


import struct  # noqa: E402

struct_error = struct.error


class TestTrasher:
    def _wav(self):
        from tests.test_audio_e2e import make_wav_bytes

        return make_wav_bytes(testgen.s16(testgen.audio_mix(8000, 800)),
                              8000)

    @pytest.mark.parametrize("seed", range(8))
    def test_trashed_wav(self, seed):
        data = trash(self._wav(), seed)

        def run():
            d = open_input_bytes(data)
            for pkt in d.packets():
                pass

        _expect_clean(run)

    @pytest.mark.parametrize("seed", range(8))
    def test_trashed_jpeg(self, seed):
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg
        from librempeg_tpu.codecs.jpeg.encoder import encode_jpeg
        from librempeg_tpu.core.frame import VideoFrame

        y, u, v = testgen.video_yuv420(32, 32, 1)
        f = VideoFrame(planes=(y, u, v), format="yuvj420p", width=32,
                       height=32, color_range="jpeg")
        data = trash(encode_jpeg(f), seed)
        _expect_clean(lambda: decode_jpeg(data))

    @pytest.mark.parametrize("seed", range(8))
    def test_trashed_mpeg4(self, seed):
        from librempeg_tpu.codecs.mpeg4.decoder import Mpeg4BitstreamDecoder
        from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder

        enc = Mpeg4Encoder(width=32, height=32, qscale=4)
        f = testgen.video_frame_yuv420(32, 32, 1)
        data = trash(bytes(enc.encode(f)[0].data), seed)
        _expect_clean(lambda: Mpeg4BitstreamDecoder().decode_frame(data))

    @pytest.mark.parametrize("seed", range(4))
    def test_trashed_flac(self, seed):
        from librempeg_tpu.codecs.api import find_decoder, find_encoder
        from librempeg_tpu.core.frame import AudioFrame

        enc = find_encoder("flac")(sample_rate=8000, channels=1)
        pcm = testgen.s16(testgen.audio_mix(8000, 4096, channels=1))
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=8000, sample_fmt="s16p", pts=0)]))
        dec = find_decoder("flac")(enc.codec_parameters())
        data = trash(bytes(pkts[0].data), seed)

        _expect_clean(lambda: dec.decode(Packet(data=data)))

    def test_noise_bsf_pipeline_survives(self):
        """Decode a noise-corrupted mjpeg stream through concealment of
        failures at the pipeline level: errors surface as MediaError."""
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg
        from librempeg_tpu.codecs.jpeg.encoder import encode_jpeg
        from librempeg_tpu.core.frame import VideoFrame

        y, u, v = testgen.video_yuv420(32, 32, 2)
        f = VideoFrame(planes=(y, u, v), format="yuvj420p", width=32,
                       height=32, color_range="jpeg")
        noise = find_bsf("noise")(amount=64, seed=7)
        pkt = Packet(data=encode_jpeg(f))
        (bad,) = noise.filter(pkt)
        _expect_clean(lambda: decode_jpeg(bytes(bad.data)))


class TestSrt:
    SAMPLE = (b"1\r\n00:00:01,000 --> 00:00:02,500\r\nHello world\r\n\r\n"
              b"2\r\n00:00:03,000 --> 00:00:04,000\r\nSecond\r\nline\r\n\r\n")

    def test_demux(self):
        d = open_input_bytes(self.SAMPLE)
        assert d.NAME == "srt"
        assert d.streams[0].codecpar.codec_type == "subtitle"
        pkts = list(d.packets())
        assert len(pkts) == 2
        assert pkts[0].pts == 1000 and pkts[0].duration == 1500
        assert pkts[0].data == b"Hello world"
        assert pkts[1].data == b"Second\nline"

    def test_roundtrip(self):
        d = open_input_bytes(self.SAMPLE)
        pkts = list(d.packets())
        mux = open_output_bytes("srt")
        from librempeg_tpu.formats.api import CodecParameters

        mux.add_stream(CodecParameters(codec_type="subtitle",
                                       codec_id="subrip"),
                       time_base=pkts[0].time_base)
        for p in pkts:
            mux.write(p)
        mux.finish()
        d2 = open_input_bytes(mux.io.getvalue())
        pkts2 = list(d2.packets())
        assert [(p.pts, p.duration, bytes(p.data)) for p in pkts] == \
            [(p.pts, p.duration, bytes(p.data)) for p in pkts2]
