"""MPEG-1/2 video decoder vs the reference decoder (bit-exact).

Vectors come from the reference's own mpeg1video/mpeg2video encoders
(the FATE vsynth model in reverse: their encode, both decodes compared
sample-exact).
"""
import subprocess

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")

W, H = 128, 96


def _encode_ref(tmp_path, codec, n=8, extra=()):
    from librempeg_tpu.utils import testgen

    raw = tmp_path / "in.yuv"
    buf = bytearray()
    for i in range(n):
        y, u, v = testgen.video_yuv420(W, H, i)
        y = np.roll(y, i * 2, axis=1)          # real motion for P/B
        buf += y.tobytes() + u.tobytes() + v.tobytes()
    raw.write_bytes(bytes(buf))
    out = tmp_path / f"v.{'m1v' if codec == 'mpeg1video' else 'm2v'}"
    subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
         "-pix_fmt", "yuv420p", "-s", f"{W}x{H}", "-r", "25",
         "-i", str(raw), "-c:v", codec, *extra, "-y", str(out)],
        check=True, capture_output=True)
    return out


def _ref_decode(path):
    r = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-i", str(path),
         "-f", "rawvideo", "-"], capture_output=True, check=True)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(len(r.stdout) // fsz):
        b = r.stdout[i * fsz:(i + 1) * fsz]
        frames.append((
            np.frombuffer(b[:W * H], np.uint8).reshape(H, W),
            np.frombuffer(b[W * H:W * H * 5 // 4],
                          np.uint8).reshape(H // 2, W // 2),
            np.frombuffer(b[W * H * 5 // 4:], np.uint8).reshape(H // 2,
                                                                W // 2)))
    return frames


def _our_decode(path, codec):
    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.core.packet import Packet

    dec = find_decoder(codec)()
    frames = dec.decode(Packet(data=path.read_bytes(), pts=0))
    frames += dec.flush()
    return [f.planes for f in frames]


def _check(tmp_path, codec, n=8, extra=()):
    es = _encode_ref(tmp_path, codec, n, extra)
    ref = _ref_decode(es)
    assert len(ref) == n
    got = _our_decode(es, codec)
    assert len(got) == n, f"decoded {len(got)}/{n}"
    for i, (r3, g3) in enumerate(zip(ref, got)):
        for name, a, b in zip("yuv", r3, g3):
            bad = np.nonzero(a != np.asarray(b))
            assert bad[0].size == 0, (
                f"frame {i} plane {name}: {bad[0].size} wrong, first "
                f"{bad[0][:3]},{bad[1][:3]}: "
                f"ref {a[bad][:3]} got {np.asarray(b)[bad][:3]}")


class TestMpeg1:
    def test_i_only(self, tmp_path):
        _check(tmp_path, "mpeg1video", 4, ("-g", "1"))

    def test_ip(self, tmp_path):
        _check(tmp_path, "mpeg1video", 8, ("-g", "8", "-bf", "0"))

    def test_ipb(self, tmp_path):
        _check(tmp_path, "mpeg1video", 10, ("-g", "10", "-bf", "2"))

    def test_qscale_range(self, tmp_path):
        _check(tmp_path, "mpeg1video", 6,
               ("-g", "6", "-bf", "0", "-qscale:v", "12"))


class TestMpeg2:
    def test_i_only(self, tmp_path):
        _check(tmp_path, "mpeg2video", 4, ("-g", "1"))

    def test_ip(self, tmp_path):
        _check(tmp_path, "mpeg2video", 8, ("-g", "8", "-bf", "0"))

    def test_ipb(self, tmp_path):
        _check(tmp_path, "mpeg2video", 10, ("-g", "10", "-bf", "2"))

    def test_intra_vlc(self, tmp_path):
        _check(tmp_path, "mpeg2video", 6,
               ("-g", "6", "-bf", "1", "-intra_vlc", "1"))

    def test_alternate_scan(self, tmp_path):
        _check(tmp_path, "mpeg2video", 6,
               ("-g", "6", "-bf", "0", "-alternate_scan", "1"))

    def test_nonlinear_quant(self, tmp_path):
        _check(tmp_path, "mpeg2video", 6,
               ("-g", "6", "-qscale:v", "20", "-non_linear_quant", "1",
                "-qmax", "28"))

    def test_high_qscale(self, tmp_path):
        _check(tmp_path, "mpeg2video", 6,
               ("-g", "3", "-bf", "1", "-qscale:v", "28"))


class TestEndToEnd:
    def test_cli_framecrc_parity_m1v(self, tmp_path):
        import subprocess as sp
        es = _encode_ref(tmp_path, "mpeg1video", 6, ("-g", "3",
                                                     "-bf", "1"))
        ours = tmp_path / "ours.crc"
        sp.run([reference_ffmpeg(), "-v", "error", "-i", str(es),
                "-f", "framecrc", "-y", str(tmp_path / "ref.crc")],
               check=True, capture_output=True)
        import sys
        sp.run([sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
                "-i", str(es), "-f", "framecrc", str(ours)],
               check=True, capture_output=True)
        ours_l = [l for l in ours.read_text().splitlines()
                  if not l.startswith("#")]
        ref_l = [l for l in (tmp_path / "ref.crc").read_text()
                 .splitlines() if not l.startswith("#")]
        assert ours_l == ref_l

    def test_mpegts_payload(self, tmp_path):
        """mpeg2video carried in TS: decoded frame data matches the
        reference (checksum column; pts normalization differs)."""
        import subprocess as sp
        from librempeg_tpu.utils import testgen

        raw = tmp_path / "in.yuv"
        buf = bytearray()
        for i in range(6):
            y, u, v = testgen.video_yuv420(W, H, i)
            buf += y.tobytes() + u.tobytes() + v.tobytes()
        raw.write_bytes(bytes(buf))
        ts = tmp_path / "t.ts"
        sp.run([reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
                "-pix_fmt", "yuv420p", "-s", f"{W}x{H}", "-r", "25",
                "-i", str(raw), "-c:v", "mpeg2video", "-g", "3",
                "-y", str(ts)], check=True, capture_output=True)
        import sys
        ours = tmp_path / "ours.crc"
        sp.run([sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
                "-i", str(ts), "-f", "framecrc", str(ours)],
               check=True, capture_output=True)
        sp.run([reference_ffmpeg(), "-v", "error", "-i", str(ts),
                "-f", "framecrc", "-y", str(tmp_path / "ref.crc")],
               check=True, capture_output=True)
        crc = lambda p: [l.split(",")[-1].strip()
                         for l in p.read_text().splitlines()
                         if l and not l.startswith("#")]
        assert crc(ours) == crc(tmp_path / "ref.crc")
