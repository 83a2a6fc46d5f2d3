"""Raw elementary-stream formats (h264/m4v/mjpeg): both directions vs
the reference (rawenc.c / m4vdec.c / rawdec.c analogs)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.formats.api import open_input, open_output
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def _encode_to(tmp_path, codec, ext, n=4, **opts):
    enc = find_encoder(codec)(width=64, height=48, **opts)
    path = tmp_path / f"own.{ext}"
    mux = open_output(str(path), format=ext)
    st = mux.add_stream(enc.codec_parameters(), time_base=enc.time_base)
    for i in range(n):
        for p in enc.encode(testgen.video_frame_yuv420(64, 48, i)):
            p.stream_index = st.index
            mux.write(p)
    for p in enc.flush():
        p.stream_index = st.index
        mux.write(p)
    mux.write_trailer()
    return path


@pytest.mark.parametrize("codec,ext,opts", [
    ("h264", "h264", {"qp": 26}),
    ("mpeg4", "m4v", {"qscale": 4}),
    ("mjpeg", "mjpeg", {}),
])
class TestRawES:
    def test_own_roundtrip(self, tmp_path, codec, ext, opts):
        path = _encode_to(tmp_path, codec, ext, **opts)
        d = open_input(str(path))
        assert d.NAME == ext
        assert d.streams[0].codecpar.codec_id == codec
        pkts = list(d.packets())
        assert len(pkts) == 4
        dec = find_decoder(codec)(d.streams[0].codecpar)
        frames = []
        for p in pkts:
            frames += dec.decode(p)
        assert len(frames) == 4
        y0 = testgen.video_yuv420(64, 48, 0)[0]
        got = np.asarray(frames[0].planes[0], float)[:48, :64]
        mse = np.mean((got - y0.astype(float)) ** 2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 30

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_reads_ours(self, tmp_path, codec, ext, opts):
        path = _encode_to(tmp_path, codec, ext, **opts)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", ext, "-i", str(path),
             "-f", "framecrc", "-"], capture_output=True, text=True)
        assert r.returncode == 0 and r.stderr == ""
        body = [ln for ln in r.stdout.splitlines() if not ln.startswith("#")]
        assert len(body) == 4

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_we_read_reference_stream(self, tmp_path, codec, ext, opts):
        if codec == "h264":
            pytest.skip("reference build cannot encode h264 (no libx264)")
        y, u, v = testgen.video_yuv420(64, 48, 0)
        raw = tmp_path / "in.yuv"
        raw.write_bytes((y.tobytes() + u.tobytes() + v.tobytes()) * 4)
        refout = tmp_path / f"ref.{ext}"
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "64x48", "-i", str(raw),
             "-c:v", codec, "-q:v", "4", "-y", str(refout)],
            capture_output=True)
        assert r.returncode == 0, r.stderr
        d = open_input(str(refout))
        assert d.NAME == ext
        pkts = list(d.packets())
        assert len(pkts) == 4
        dec = find_decoder(codec)(d.streams[0].codecpar)
        frames = []
        for p in pkts:
            frames += dec.decode(p)
        assert len(frames) == 4
