"""MPEG-TS container tests."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import open_input_bytes, open_output_bytes
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def build_ts(n=4, w=64, h=48):
    enc = find_encoder("mpeg4")(width=w, height=h, qscale=3,
                                framerate=Rational(25, 1))
    mux = open_output_bytes("mpegts")
    st = mux.add_stream(enc.codec_parameters(), Rational(1, 25))
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                       height=h, pts=i, time_base=Rational(1, 25))
        for pkt in enc.encode(f):
            mux.write(pkt.replace(stream_index=st.index))
    mux.finish()
    return mux.io.getvalue()


class TestMpegTs:
    def test_packets_are_188(self):
        blob = build_ts()
        assert len(blob) % 188 == 0
        assert all(blob[i] == 0x47 for i in range(0, len(blob), 188))

    def test_mux_demux_roundtrip(self):
        blob = build_ts()
        d = open_input_bytes(blob)
        assert d.NAME == "mpegts"
        st = d.streams[0]
        assert st.codecpar.codec_id == "mpeg4"
        pkts = list(d.packets())
        assert len(pkts) == 4
        # decode first packet with our mpeg4 decoder
        from librempeg_tpu.codecs.mpeg4.decoder import Mpeg4BitstreamDecoder

        dec = Mpeg4BitstreamDecoder()
        out = dec.decode_frame(bytes(pkts[0].data))
        assert out is not None
        y0, _, _ = testgen.video_yuv420(64, 48, 0)
        mse = np.mean((out[0][:48, :64].astype(float) - y0.astype(float))**2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 30

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_reads_our_ts(self, tmp_path):
        p = reference_ffmpeg()
        out = subprocess.run([p, "-v", "0", "-demuxers"],
                             capture_output=True)
        if b"mpegts" not in out.stdout:
            pytest.skip("reference lacks mpegts demuxer")
        blob = build_ts()
        f = tmp_path / "ours.ts"
        f.write_bytes(blob)
        r = subprocess.run(
            [p, "-v", "error", "-i", str(f), "-f", "framecrc", "-"],
            capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[:400]
        lines = [l for l in r.stdout.decode().splitlines()
                 if l and not l.startswith("#")]
        assert len(lines) == 4
