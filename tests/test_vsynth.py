"""vsynth-style codec matrix: encode->decode roundtrips across codecs,
sizes, and qualities with PSNR gates (the tests/ref/vsynth model)."""
import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.native import build as native
from librempeg_tpu.utils import testgen
from librempeg_tpu.utils.profiler import bench_kernel, report, scoped


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))**2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def frames(w, h, n, fmt="yuv420p"):
    out = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        y = np.roll(y, i, axis=1)
        out.append(VideoFrame(planes=(y, u, v), format=fmt, width=w,
                              height=h, pts=i, time_base=Rational(1, 25)))
    return out


SIZES = [(32, 32), (64, 48), (176, 144)]


class TestVsynthMatrix:
    @pytest.mark.parametrize("w,h", SIZES)
    def test_mpeg4_roundtrip(self, w, h):
        enc = find_encoder("mpeg4")(width=w, height=h, qscale=3, gop_size=3)
        dec = find_decoder("mpeg4")()
        fs = frames(w, h, 4)
        outs = []
        for f in fs:
            for pkt in enc.encode(f):
                outs += dec.decode(pkt)
        assert len(outs) == 4
        ps = [psnr(outs[i].planes[0], fs[i].planes[0]) for i in range(4)]
        assert min(ps) > 28, f"{w}x{h}: {['%.1f' % p for p in ps]}"

    @pytest.mark.parametrize("w,h", SIZES)
    @pytest.mark.skipif(not native.available(), reason="native unavailable")
    def test_mjpeg_roundtrip(self, w, h):
        if w % 2 or h % 2:
            pytest.skip("odd")
        enc = find_encoder("mjpeg")(width=w, height=h, quality=90)
        dec = find_decoder("mjpeg")()
        fs = frames(w, h, 2, fmt="yuvj420p")
        for f in fs:
            f = f.replace(color_range="jpeg")
            for pkt in enc.encode(f):
                (g,) = dec.decode(pkt)
                assert psnr(g.planes[0], f.planes[0]) > 36

    def test_rawvideo_bit_exact(self):
        from librempeg_tpu.formats.api import CodecParameters

        enc = find_encoder("rawvideo")(width=64, height=48)
        par = CodecParameters(codec_type="video", codec_id="rawvideo",
                              width=64, height=48, pix_fmt="yuv420p")
        dec = find_decoder("rawvideo")(par)
        f = frames(64, 48, 1)[0]
        (g,) = dec.decode(enc.encode(f)[0])
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(g.planes[i]),
                                          np.asarray(f.planes[i]))


class TestProfiler:
    def test_scoped_and_report(self):
        import librempeg_tpu.utils.profiler as prof

        prof.reset()
        holder = []
        with prof.scoped("work", holder):
            import jax.numpy as jnp

            holder.append(jnp.ones((8, 8)) * 2)
        r = prof.report()
        assert "work" in r and r["work"]["calls"] == 1

    def test_bench_kernel(self):
        import jax.numpy as jnp

        from librempeg_tpu.ops import dct8x8

        x = jnp.ones((16, 8, 8), jnp.float32)
        stats = bench_kernel(dct8x8.fdct, x, iters=3, warmup=1)
        assert stats["mean_ms"] > 0
