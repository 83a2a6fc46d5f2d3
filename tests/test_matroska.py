"""Matroska demuxer tests against reference-muxed files."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.formats.api import open_input
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def _ref_has_mkv_mux():
    p = reference_ffmpeg()
    if p is None:
        return False
    out = subprocess.run([p, "-v", "0", "-muxers"], capture_output=True)
    return b"matroska" in out.stdout


@pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
class TestMatroska:
    def _make(self, tmp_path, ext="mkv"):
        y, u, v = testgen.video_yuv420(64, 48, 0)
        raw = tmp_path / "in.yuv"
        raw.write_bytes((y.tobytes() + u.tobytes() + v.tobytes()) * 4)
        mkv = tmp_path / f"ref.{ext}"
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "64x48", "-i", str(raw),
             "-c:v", "mpeg4", "-q:v", "4", "-y", str(mkv)],
            capture_output=True)
        if r.returncode != 0:
            pytest.skip("reference lacks matroska muxer")
        return mkv

    def test_demux_reference_mkv(self, tmp_path):
        mkv = self._make(tmp_path)
        d = open_input(str(mkv))
        assert d.NAME == "matroska"
        st = d.streams[0]
        assert st.codecpar.codec_id == "mpeg4"
        assert (st.codecpar.width, st.codecpar.height) == (64, 48)
        pkts = list(d.packets())
        assert len(pkts) == 4
        # decode the first packet with our mpeg4 decoder
        from librempeg_tpu.codecs.mpeg4.decoder import Mpeg4BitstreamDecoder

        dec = Mpeg4BitstreamDecoder()
        if st.codecpar.extradata:
            dec.decode_frame(bytes(st.codecpar.extradata))
        out = dec.decode_frame(bytes(pkts[0].data))
        assert out is not None
        y0, _, _ = testgen.video_yuv420(64, 48, 0)
        mse = np.mean((out[0][:48, :64].astype(float) - y0.astype(float))**2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 30
