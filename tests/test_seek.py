"""Generic container seek (-ss): our keyframe landing must match the
reference decoder's for every shipped container (framecrc after seek).
"""
import subprocess
import sys

import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")

W, H = 128, 96


def _mk_input(tmp_path, ext, vcodec, extra=()):
    from librempeg_tpu.utils import testgen
    import numpy as np

    raw = tmp_path / "in.yuv"
    buf = bytearray()
    for i in range(24):
        y, u, v = testgen.video_yuv420(W, H, i)
        y = np.roll(y, i * 3, axis=1)
        buf += y.tobytes() + u.tobytes() + v.tobytes()
    raw.write_bytes(bytes(buf))
    out = tmp_path / f"t.{ext}"
    subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
         "-pix_fmt", "yuv420p", "-s", f"{W}x{H}", "-r", "25",
         "-i", str(raw), "-c:v", vcodec, "-g", "6", *extra,
         "-y", str(out)], check=True, capture_output=True)
    return out


def _crc_lines(path):
    return [ln.split(",")[-1].strip()
            for ln in path.read_text().splitlines()
            if ln and not ln.startswith("#")]


def _seek_compare(tmp_path, src, ss="0.5"):
    ours = tmp_path / "ours.crc"
    refc = tmp_path / "ref.crc"
    subprocess.run(
        [sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
         "-ss", ss, "-i", str(src), "-f", "framecrc", str(ours)],
        check=True, capture_output=True)
    subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-ss", ss, "-i", str(src),
         "-f", "framecrc", "-y", str(refc)],
        check=True, capture_output=True)
    a, b = _crc_lines(ours), _crc_lines(refc)
    assert a and a == b, f"ours {len(a)} frames vs ref {len(b)}"


def test_seek_mpegts(tmp_path):
    _seek_compare(tmp_path, _mk_input(tmp_path, "ts", "mpeg2video"))


def test_seek_avi(tmp_path):
    _seek_compare(tmp_path, _mk_input(tmp_path, "avi", "mpeg4"))


@pytest.mark.slow
def test_seek_flv(tmp_path):
    """FLV (h264 payload from our own encoder; both decoders read it)."""
    import numpy as np
    from librempeg_tpu.utils import testgen

    raw = tmp_path / "in.yuv"
    buf = bytearray()
    for i in range(24):
        y, u, v = testgen.video_yuv420(W, H, i)
        y = np.roll(y, i * 3, axis=1)
        buf += y.tobytes() + u.tobytes() + v.tobytes()
    raw.write_bytes(bytes(buf))
    flv = tmp_path / "t.flv"
    subprocess.run(
        [sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
         "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", f"{W}x{H}",
         "-r", "25", "-i", str(raw), "-c:v", "h264", "-g:v", "6",
         str(flv)], check=True, capture_output=True)
    _seek_compare(tmp_path, flv)


def test_seek_mpegvideo_es(tmp_path):
    """Raw ES has no container timestamps; the reference's seek there
    is a byte-position estimate (it landed mid-GOP-before on this
    stream), so instead assert OUR semantics: sample-accurate landing,
    frames bit-identical to the reference's full decode."""
    src = _mk_input(tmp_path, "m2v", "mpeg2video")
    full = tmp_path / "full.crc"
    subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-i", str(src),
         "-f", "framecrc", "-y", str(full)],
        check=True, capture_output=True)
    ours = tmp_path / "ours.crc"
    subprocess.run(
        [sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
         "-ss", "0.5", "-i", str(src), "-f", "framecrc", str(ours)],
        check=True, capture_output=True)
    all_crc = _crc_lines(full)
    got = _crc_lines(ours)
    # 0.5 s at 25 fps: first frame with pts >= 12.5 is 13
    assert got == all_crc[13:]
