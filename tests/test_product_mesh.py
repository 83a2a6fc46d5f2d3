"""-mesh product path: the real transcode over a multi-device mesh is
bit-identical to the single-device run (VERDICT r2 #3 done-criterion).
Runs on the 8-way virtual CPU mesh from conftest."""
import numpy as np
import pytest

from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.parallel import product_mesh as PM
from librempeg_tpu.utils import testgen

pytestmark = pytest.mark.slow  # multi-minute mesh conformance


@pytest.fixture(autouse=True)
def _reset_mesh():
    yield
    PM.set_active_mesh(None)


def _frames(n, w=128, h=128):
    out = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        y = np.roll(y, i * 3, axis=1)
        out.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                              width=w, height=h, pts=i,
                              time_base=Rational(1, 25)))
    return out


def _encode(frames, mesh_spec):
    from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder

    PM.set_active_mesh(PM.make_mesh(mesh_spec) if mesh_spec else None)
    enc = Mpeg4Encoder(width=128, height=128, qscale=5, gop_size=10)
    data = b""
    for f in frames:
        for p in enc.encode(f):
            data += p.data
    for p in enc.flush():
        data += p.data
    PM.set_active_mesh(None)
    return data


def test_mpeg4_encode_sharded_bit_identical():
    frames = _frames(4)
    single = _encode(frames, None)
    assert _encode(frames, "spatial=4") == single
    assert _encode(frames, "data=2,spatial=4") == single


def test_scaler_sharded_bit_identical():
    from librempeg_tpu.scale.scaler import get_scaler

    y, u, v = testgen.video_yuv420(256, 192, 1)
    f = VideoFrame(planes=(y, u, v), format="yuv420p", width=256,
                   height=192, pts=0, time_base=Rational(1, 25))
    sc = get_scaler("yuv420p", 256, 192, "yuv420p", 128, 96)
    ref = [np.asarray(p) for p in sc.scale_frame(f).planes]
    PM.set_active_mesh(PM.make_mesh("spatial=4"))
    got = [np.asarray(p) for p in sc.scale_frame(f).planes]
    PM.set_active_mesh(None)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_full_cli_transcode_mesh_bit_identical(tmp_path):
    """Bitstream in -> bitstream out on the mesh == single device."""
    import subprocess
    import sys

    from librempeg_tpu.codecs.h264.codec import H264Encoder
    from librempeg_tpu.formats.api import open_output

    # make a small h264 input with our own encoder
    frames = _frames(6)
    enc = H264Encoder(width=128, height=128, qp=26, g=6)
    es = tmp_path / "in.264"
    data = b""
    for f in frames:
        for p in enc.encode(f):
            data += p.data
    es.write_bytes(data)

    def run(out, mesh=None):
        cmd = [sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
               "-i", str(es)]
        if mesh:
            cmd += ["-mesh", mesh]
        cmd += ["-c:v", "mpeg4", "-q:v", "6", "-s", "64x64", str(out)]
        subprocess.run(cmd, check=True, capture_output=True)
        return out.read_bytes()

    a = run(tmp_path / "single.m4v")
    b = run(tmp_path / "mesh.m4v", "data=2,spatial=4")
    assert a == b and len(a) > 0
