"""MPEG-4 encoder tests: bitstream validity + quality via the reference
decoder (the encode-side acceptance FATE's vsynth suites model)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def ref_decode_m4v(path, w, h, n):
    out = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-f", "m4v", "-i", str(path),
         "-f", "rawvideo", "-"], capture_output=True, check=True)
    fsz = w * h * 3 // 2
    frames = []
    for i in range(n):
        buf = out.stdout[i * fsz:(i + 1) * fsz]
        if len(buf) < fsz:
            break
        frames.append(np.frombuffer(buf[:w * h], np.uint8).reshape(h, w))
    return frames, out.stderr.decode()


class TestMpeg4Intra:
    def test_single_i_frame(self, tmp_path):
        w, h = 64, 48
        enc = Mpeg4Encoder(width=w, height=h, qscale=2)
        f = testgen.video_frame_yuv420(w, h, 1)
        pkts = enc.encode(f)
        m4v = tmp_path / "out.m4v"
        m4v.write_bytes(pkts[0].data)
        frames, err = ref_decode_m4v(m4v, w, h, 1)
        assert frames, f"reference could not decode: {err}"
        p = psnr(frames[0], f.planes[0])
        assert p > 34, f"I-frame PSNR {p:.1f} dB"

    def test_i_frame_quality_scales(self, tmp_path):
        w, h = 64, 48
        f = testgen.video_frame_yuv420(w, h, 2)
        sizes = []
        for q in (2, 8, 20):
            enc = Mpeg4Encoder(width=w, height=h, qscale=q)
            sizes.append(len(enc.encode(f)[0].data))
        assert sizes[0] > sizes[1] > sizes[2]


class TestMpeg4GOP:
    def test_ip_sequence(self, tmp_path):
        w, h = 96, 64
        enc = Mpeg4Encoder(width=w, height=h, qscale=3, gop_size=5)
        frames_in = []
        data = b""
        for i in range(8):
            y, u, v = testgen.video_yuv420(w, h, i)
            # slow pan so P-frames have real motion
            y = np.roll(y, i * 2, axis=1)
            from librempeg_tpu.core.frame import VideoFrame

            f = VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                           height=h, pts=i, time_base=Rational(1, 25))
            frames_in.append(f)
            data += enc.encode(f)[0].data
        m4v = tmp_path / "seq.m4v"
        m4v.write_bytes(data)
        frames, err = ref_decode_m4v(m4v, w, h, 8)
        assert len(frames) == 8, f"decoded {len(frames)}: {err}"
        ps = [psnr(frames[i], frames_in[i].planes[0]) for i in range(8)]
        assert min(ps) > 30, f"PSNR curve {['%.1f' % p for p in ps]}"
        assert "error" not in err.lower() or not err

    def test_recon_matches_decoder(self, tmp_path):
        """Drift check: our in-loop recon should track the reference
        decoder's output closely (identical up to clipping nuances)."""
        w, h = 64, 48
        enc = Mpeg4Encoder(width=w, height=h, qscale=4, gop_size=10)
        data = b""
        recons = []
        for i in range(6):
            y, u, v = testgen.video_yuv420(w, h, i)
            y = np.roll(y, i, axis=0)
            from librempeg_tpu.core.frame import VideoFrame

            f = VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                           height=h, pts=i, time_base=Rational(1, 25))
            data += enc.encode(f)[0].data
            recons.append(np.asarray(enc._ref[0]).astype(np.uint8))
        m4v = tmp_path / "drift.m4v"
        m4v.write_bytes(data)
        frames, err = ref_decode_m4v(m4v, w, h, 6)
        assert len(frames) == 6, err
        for i in range(6):
            p = psnr(frames[i], recons[i])
            assert p > 40, f"frame {i}: recon drift PSNR {p:.1f}"


def test_native_pack_matches_python():
    """C++ VLC packer (native/mpeg4.cpp) is bit-exact with the Python
    MB-layer packer across I/P frames, skip MBs, and escape levels."""
    import numpy as np

    from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational
    from librempeg_tpu.native import build as native

    if not native.available():
        import pytest

        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(7)
    W, H = 96, 64
    base = rng.integers(0, 256, (H, W)).astype(np.uint8)
    frames = []
    for i in range(6):
        y = np.roll(base, (i * 2, i * 3), axis=(0, 1))
        y = (y * 0.7 + 40 + rng.integers(0, 30, (H, W))) \
            .clip(0, 255).astype(np.uint8)
        u = rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                 width=W, height=H, pts=i,
                                 time_base=Rational(1, 25)))

    def run(use_native):
        orig = native.available
        if not use_native:
            native.available = lambda: False
        try:
            enc = Mpeg4Encoder(width=W, height=H,
                               framerate=Rational(25, 1), qscale=5,
                               gop_size=3)
            return [bytes(enc.encode(f)[0].data) for f in frames]
        finally:
            native.available = orig

    assert run(True) == run(False)
