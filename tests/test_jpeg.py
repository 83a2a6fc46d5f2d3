"""JPEG codec tests: roundtrip quality gates and cross-validation against
the reference's mjpeg decoder/encoder (fate-style PSNR gates)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg
from librempeg_tpu.codecs.jpeg.encoder import encode_jpeg
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.native import build as native
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native extension unavailable")


def psnr(a, b, peak=255.0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def make_frame(w=64, h=48, idx=1, fmt="yuvj420p"):
    y, u, v = testgen.video_yuv420(w, h, idx)
    if fmt in ("yuvj444p",):
        u = np.kron(u, np.ones((2, 2))).astype(np.uint8)[:h, :w]
        v = np.kron(v, np.ones((2, 2))).astype(np.uint8)[:h, :w]
    return VideoFrame(planes=(y, u, v), format=fmt, width=w, height=h,
                      color_range="jpeg")


class TestJpegRoundtrip:
    @pytest.mark.parametrize("fmt", ["yuvj420p", "yuvj444p"])
    def test_encode_decode_high_quality(self, fmt):
        f = make_frame(fmt=fmt)
        data = encode_jpeg(f, quality=95)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        g = decode_jpeg(data)
        assert g.format == fmt
        assert (g.width, g.height) == (64, 48)
        p = psnr(g.planes[0], f.planes[0])
        assert p > 40, f"luma PSNR {p:.1f}"

    def test_gray(self):
        y, _, _ = testgen.video_yuv420(64, 48, 0)
        f = VideoFrame(planes=(y,), format="gray", width=64, height=48)
        g = decode_jpeg(encode_jpeg(f, quality=95))
        assert g.format == "gray"
        assert psnr(g.planes[0], y) > 40

    def test_odd_dimensions(self):
        f = make_frame(62, 46, 2)
        f = VideoFrame(planes=(f.planes[0][:46, :62],
                               f.planes[1][:23, :31],
                               f.planes[2][:23, :31]),
                       format="yuvj420p", width=62, height=46,
                       color_range="jpeg")
        g = decode_jpeg(encode_jpeg(f, quality=95))
        assert (g.width, g.height) == (62, 46)
        assert psnr(g.planes[0], f.planes[0]) > 38

    def test_quality_monotone(self):
        f = make_frame(96, 64, 3)
        sizes = [len(encode_jpeg(f, quality=q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]


@pytest.mark.skipif(reference_ffmpeg() is None, reason="reference not built")
class TestJpegVsReference:
    def test_reference_decodes_our_jpeg(self, tmp_path):
        f = make_frame(64, 48, 4)
        data = encode_jpeg(f, quality=95)
        p = tmp_path / "ours.jpg"
        p.write_bytes(data)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(p),
             "-f", "rawvideo", "-pix_fmt", "yuvj420p", "-"],
            capture_output=True, check=True)
        ysz = 64 * 48
        ry = np.frombuffer(out.stdout[:ysz], np.uint8).reshape(48, 64)
        pp = psnr(ry, f.planes[0])
        assert pp > 40, f"reference decode PSNR {pp:.1f}"

    def test_we_decode_reference_jpeg(self, tmp_path):
        y, u, v = testgen.video_yuv420(64, 48, 5)
        raw = tmp_path / "in.yuv"
        raw.write_bytes(y.tobytes() + u.tobytes() + v.tobytes())
        jpg = tmp_path / "ref.jpg"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "64x48", "-i", str(raw),
             "-c:v", "mjpeg", "-q:v", "2", "-y", str(jpg)], check=True)
        g = decode_jpeg(jpg.read_bytes())
        assert (g.width, g.height) == (64, 48)
        pp = psnr(g.planes[0], y)
        assert pp > 30, f"our decode PSNR vs source {pp:.1f}"
        # tighter: against the reference's own decode of the same file
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(jpg),
             "-f", "rawvideo", "-"], capture_output=True, check=True)
        ref_y = np.frombuffer(out.stdout[:64 * 48], np.uint8).reshape(48, 64)
        assert psnr(g.planes[0], ref_y) > 50

    def test_decode_matches_reference_decode(self, tmp_path):
        """Both decoders on the same file: near-identical output (both use
        the same fixed-point IDCT contract)."""
        y, u, v = testgen.video_yuv420(96, 64, 6)
        raw = tmp_path / "in.yuv"
        raw.write_bytes(y.tobytes() + u.tobytes() + v.tobytes())
        jpg = tmp_path / "ref.jpg"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "96x64", "-i", str(raw),
             "-c:v", "mjpeg", "-q:v", "4", "-y", str(jpg)], check=True)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(jpg),
             "-f", "rawvideo", "-"], capture_output=True, check=True)
        ref_y = np.frombuffer(out.stdout[:96 * 64], np.uint8).reshape(64, 96)
        g = decode_jpeg(jpg.read_bytes())
        diff = np.abs(np.asarray(g.planes[0]).astype(int) - ref_y.astype(int))
        # same IDCT semantics -> at most off-by-one from rounding details
        assert diff.max() <= 1, f"max diff {diff.max()}"
        assert (diff > 0).mean() < 0.05  # ~1% off-by-one in practice
