"""Scaler tests: invariants (identity, DC preservation), conversion
roundtrips, and PSNR gates vs the reference's swscale output."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.scale import Scaler
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def psnr(a, b, peak=255.0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


class TestScalerBasics:
    def test_identity_yuv(self):
        y, u, v = testgen.video_yuv420(64, 48, 0)
        s = Scaler("yuv420p", 64, 48, "yuv420p", 64, 48)
        oy, ou, ov = s.scale_planes((y, u, v))
        np.testing.assert_array_equal(np.asarray(oy), y)
        np.testing.assert_array_equal(np.asarray(ou), u)
        np.testing.assert_array_equal(np.asarray(ov), v)

    @pytest.mark.parametrize("kernel", ["bilinear", "bicubic", "lanczos"])
    def test_flat_field_preserved(self, kernel):
        y = np.full((48, 64), 100, np.uint8)
        u = np.full((24, 32), 64, np.uint8)
        v = np.full((24, 32), 192, np.uint8)
        s = Scaler("yuv420p", 64, 48, "yuv420p", 32, 24, kernel=kernel)
        oy, ou, ov = s.scale_planes((y, u, v))
        assert np.all(np.asarray(oy) == 100)
        assert np.all(np.asarray(ou) == 64)
        assert np.all(np.asarray(ov) == 192)

    def test_downscale_up_close(self):
        """1080p->720p->1080p keeps PSNR high on smooth content."""
        yy, xx = np.mgrid[0:270, 0:480]
        y = (128 + 80 * np.sin(xx / 40) * np.cos(yy / 30)).astype(np.uint8)
        u = np.full((135, 240), 128, np.uint8)
        v = np.full((135, 240), 128, np.uint8)
        down = Scaler("yuv420p", 480, 270, "yuv420p", 320, 180)
        up = Scaler("yuv420p", 320, 180, "yuv420p", 480, 270)
        oy = np.asarray(up.scale_planes(down.scale_planes((y, u, v)))[0])
        assert psnr(oy, y) > 38

    def test_yuv_to_rgb_gray_point(self):
        y = np.full((16, 16), 128, np.uint8)
        u = np.full((8, 8), 128, np.uint8)
        v = np.full((8, 8), 128, np.uint8)
        s = Scaler("yuv420p", 16, 16, "rgb24", 16, 16)
        (rgb,) = s.scale_planes((y, u, v))
        rgb = np.asarray(rgb)
        # limited-range Y=128 -> (128-16)*255/219 = 130.4 -> 130
        assert rgb.shape == (16, 16, 3)
        assert np.all(np.abs(rgb.astype(int) - 130) <= 1)

    def test_rgb_yuv_roundtrip(self):
        rgb = testgen.video_rgb(64, 48, 3)
        to_yuv = Scaler("rgb24", 64, 48, "yuv444p", 64, 48)
        back = Scaler("yuv444p", 64, 48, "rgb24", 64, 48)
        (rgb2,) = back.scale_planes(to_yuv.scale_planes((rgb,)))
        assert psnr(np.asarray(rgb2), rgb) > 45

    def test_batched_matches_single(self):
        frames = [testgen.video_yuv420(64, 48, i) for i in range(3)]
        s = Scaler("yuv420p", 64, 48, "yuv420p", 32, 24)
        singles = [tuple(np.asarray(p) for p in s.scale_planes(f))
                   for f in frames]
        batch = tuple(np.stack([f[i] for f in frames]) for i in range(3))
        batched = s.scale_planes(batch)
        for i in range(3):
            for pi in range(3):
                # XLA may fuse the batched program differently; allow the
                # 1-LSB wobble at exact .5 rounding boundaries
                diff = np.abs(np.asarray(batched[pi])[i].astype(int)
                              - singles[i][pi].astype(int))
                assert diff.max() <= 1

    def test_bgr24_channel_order(self):
        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[..., 0] = 200  # pure red
        s = Scaler("rgb24", 8, 8, "bgr24", 8, 8)
        (bgr,) = s.scale_planes((rgb,))
        bgr = np.asarray(bgr)
        assert np.all(bgr[..., 2] == 200) and np.all(bgr[..., 0] == 0)

    def test_gray(self):
        y, u, v = testgen.video_yuv420(32, 32, 1)
        s = Scaler("yuv420p", 32, 32, "gray", 32, 32)
        (g,) = s.scale_planes((y, u, v))
        np.testing.assert_array_equal(np.asarray(g), y)


@pytest.mark.skipif(reference_ffmpeg() is None, reason="reference not built")
class TestVsReference:
    def _ref_scale(self, tmp_path, y, u, v, w, h, dw, dh, flags="bicubic",
                   dst_fmt="yuv420p"):
        src = tmp_path / "in.yuv"
        src.write_bytes(y.tobytes() + u.tobytes() + v.tobytes())
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", f"{w}x{h}", "-i", str(src),
             "-vf", f"scale={dw}:{dh}:flags={flags}",
             "-pix_fmt", dst_fmt, "-f", "rawvideo", "-"],
            capture_output=True, check=True)
        return out.stdout

    def test_downscale_vs_reference(self, tmp_path):
        w, h, dw, dh = 640, 360, 426, 240
        y, u, v = testgen.video_yuv420(w, h, 5)
        ref = self._ref_scale(tmp_path, y, u, v, w, h, dw, dh)
        ry = np.frombuffer(ref[: dw * dh], np.uint8).reshape(dh, dw)
        s = Scaler("yuv420p", w, h, "yuv420p", dw, dh, kernel="bicubic")
        oy = np.asarray(s.scale_planes((y, u, v))[0])
        p = psnr(oy, ry)
        assert p > 30, f"PSNR vs reference scale: {p:.1f} dB"

    def test_yuv_to_rgb_vs_reference(self, tmp_path):
        w, h = 64, 48
        y, u, v = testgen.video_yuv420(w, h, 2)
        ref = self._ref_scale(tmp_path, y, u, v, w, h, w, h, dst_fmt="rgb24")
        ref_rgb = np.frombuffer(ref, np.uint8).reshape(h, w, 3)
        s = Scaler("yuv420p", w, h, "rgb24", w, h)
        (rgb,) = s.scale_planes((y, u, v))
        p = psnr(np.asarray(rgb), ref_rgb)
        assert p > 28, f"PSNR vs reference csc: {p:.1f} dB"


class TestSemiPlanar:
    def test_yuv420p_to_nv12_roundtrip(self):
        y, u, v = testgen.video_yuv420(64, 48, 2)
        to_nv = Scaler("yuv420p", 64, 48, "nv12", 64, 48)
        yp, uv = to_nv.scale_planes((y, u, v))
        assert np.asarray(uv).shape == (24, 32, 2)
        np.testing.assert_array_equal(np.asarray(uv)[..., 0], u)
        np.testing.assert_array_equal(np.asarray(uv)[..., 1], v)
        back = Scaler("nv12", 64, 48, "yuv420p", 64, 48)
        y2, u2, v2 = back.scale_planes((np.asarray(yp), np.asarray(uv)))
        np.testing.assert_array_equal(np.asarray(y2), y)
        np.testing.assert_array_equal(np.asarray(u2), u)
        np.testing.assert_array_equal(np.asarray(v2), v)

    def test_nv12_scale(self):
        y, u, v = testgen.video_yuv420(64, 48, 1)
        uv = np.stack([u, v], axis=-1)
        s = Scaler("nv12", 64, 48, "nv12", 32, 24)
        yp, uvp = s.scale_planes((y, uv))
        assert np.asarray(yp).shape == (24, 32)
        assert np.asarray(uvp).shape == (12, 16, 2)

    def test_nv21_order(self):
        y, u, v = testgen.video_yuv420(16, 16, 0)
        s = Scaler("yuv420p", 16, 16, "nv21", 16, 16)
        yp, vu = s.scale_planes((y, u, v))
        np.testing.assert_array_equal(np.asarray(vu)[..., 0], v)
        np.testing.assert_array_equal(np.asarray(vu)[..., 1], u)

    def test_10bit_yuv(self):
        y = (np.random.default_rng(0).integers(0, 1024, (16, 16))
             .astype(np.uint16))
        u = np.full((8, 8), 512, np.uint16)
        v = np.full((8, 8), 512, np.uint16)
        s = Scaler("yuv420p10le", 16, 16, "yuv420p", 16, 16)
        y8, u8, v8 = s.scale_planes((y, u, v))
        np.testing.assert_allclose(np.asarray(y8).astype(int),
                                   (y.astype(float) * 255 / 1023).round(),
                                   atol=1)


class TestFormatSweep:
    """Descriptor-driven coverage: every registered planar format must
    convert to and from yuv444p/rgb through the generic plan — adding a
    format row must not require scaler code."""

    def test_all_registered_formats_convert(self):
        import numpy as np
        from librempeg_tpu.core import pixfmt as pf

        rng = np.random.RandomState(0)
        skipped = []
        for fmt, d in sorted(pf.FORMATS.items()):
            if d.is_float:
                mid = "grayf32le" if d.nb_planes == 1 else "rgbaf32le"
            else:
                mid = "yuv444p" if not d.is_rgb else "rgb24"
            try:
                fwd = Scaler(fmt, 32, 24, mid, 32, 24)
                rev = Scaler(mid, 32, 24, fmt, 32, 24)
            except Exception as e:   # noqa: BLE001
                skipped.append((fmt, str(e)[:60]))
                continue
            planes = []
            mx = (1 << min(d.bit_depth, 16)) - 1
            for p in d.planes:
                h, w = 24 >> p.log2_chroma_h, 32 >> p.log2_chroma_w
                shape = (h, w, len(p.components)) \
                    if len(p.components) > 1 and d.is_rgb else \
                    ((h, w) if len(p.components) == 1 else (h, w))
                if d.is_float:
                    arr = rng.rand(h, w).astype(np.float32) \
                        if len(p.components) == 1 else \
                        rng.rand(h, w, len(p.components)).astype(np.float32)
                elif len(p.components) > 1:
                    dt = np.uint8 if d.bit_depth <= 8 else np.uint16
                    arr = rng.randint(0, mx + 1,
                                      (h, w * len(p.components))
                                      if not d.is_rgb else
                                      (h, w, len(p.components))).astype(dt)
                else:
                    dt = np.uint8 if d.bit_depth <= 8 else np.uint16
                    arr = rng.randint(0, mx + 1, (h, w)).astype(dt)
                planes.append(arr)
            try:
                out = fwd.scale_planes(tuple(planes))
                rev.scale_planes(tuple(np.asarray(o) for o in out))
            except Exception as e:   # noqa: BLE001
                skipped.append((fmt, str(e)[:60]))
        # packed/interleaved host formats may need bespoke loaders; the
        # planar table must be fully covered
        assert not [s for s in skipped
                    if "p" in s[0] or s[0].startswith("gray")], skipped
