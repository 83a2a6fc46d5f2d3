"""AVI container tests incl. cross-validation with the reference."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_encoder
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import (
    CodecParameters,
    open_input,
    open_input_bytes,
    open_output_bytes,
)
from librempeg_tpu.native import build as native
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def build_mjpeg_avi(n=3, w=64, h=48):
    from librempeg_tpu.codecs.jpeg.encoder import encode_jpeg
    from librempeg_tpu.core.frame import VideoFrame

    mux = open_output_bytes("avi")
    mux.add_stream(CodecParameters(
        codec_type="video", codec_id="mjpeg", width=w, height=h,
        pix_fmt="yuvj420p", framerate=Rational(25, 1)),
        time_base=Rational(1, 25))
    frames = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        f = VideoFrame(planes=(y, u, v), format="yuvj420p", width=w,
                       height=h, pts=i, color_range="jpeg")
        frames.append(f)
        mux.write(Packet(data=encode_jpeg(f, 95), pts=i, dts=i, duration=1))
    mux.finish()
    return mux.io.getvalue(), frames


@pytest.mark.skipif(not native.available(), reason="native unavailable")
class TestAvi:
    def test_roundtrip(self):
        blob, frames = build_mjpeg_avi()
        d = open_input_bytes(blob)
        assert d.NAME == "avi"
        st = d.streams[0]
        assert st.codecpar.codec_id == "mjpeg"
        assert (st.codecpar.width, st.codecpar.height) == (64, 48)
        pkts = list(d.packets())
        assert len(pkts) == 3
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg

        g = decode_jpeg(bytes(pkts[0].data))
        assert (g.width, g.height) == (64, 48)

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_reads_our_avi(self, tmp_path):
        blob, frames = build_mjpeg_avi()
        f = tmp_path / "ours.avi"
        f.write_bytes(blob)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(f),
             "-f", "framecrc", "-"], capture_output=True, check=True)
        lines = [l for l in out.stdout.decode().splitlines()
                 if l and not l.startswith("#")]
        assert len(lines) == 3

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_we_read_reference_avi(self, tmp_path):
        y, u, v = testgen.video_yuv420(64, 48, 0)
        raw = tmp_path / "in.yuv"
        raw.write_bytes((y.tobytes() + u.tobytes() + v.tobytes()) * 3)
        avi = tmp_path / "ref.avi"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "64x48", "-i", str(raw),
             "-c:v", "mjpeg", "-q:v", "3", "-y", str(avi)], check=True)
        d = open_input(str(avi))
        st = d.streams[0]
        assert st.codecpar.codec_id == "mjpeg"
        pkts = list(d.packets())
        assert len(pkts) == 3
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg

        g = decode_jpeg(bytes(pkts[0].data))
        assert (g.width, g.height) == (64, 48)

    def test_audio_video_interleaved(self):
        mux = open_output_bytes("avi")
        mux.add_stream(CodecParameters(
            codec_type="video", codec_id="rawvideo", width=16, height=16,
            pix_fmt="bgr24", framerate=Rational(25, 1)),
            time_base=Rational(1, 25))
        mux.add_stream(CodecParameters(
            codec_type="audio", codec_id="pcm_s16le", sample_rate=8000,
            nb_channels=1, block_align=2), time_base=Rational(1, 8000))
        for i in range(3):
            mux.write(Packet(data=b"\0" * (16 * 16 * 3), pts=i, dts=i,
                             duration=1, stream_index=0,
                             time_base=Rational(1, 25)))
            mux.write(Packet(data=b"\0" * 640, pts=i * 320, dts=i * 320,
                             duration=320, stream_index=1,
                             time_base=Rational(1, 8000)))
        mux.finish()
        d = open_input_bytes(mux.io.getvalue())
        assert len(d.streams) == 2
        pkts = list(d.packets())
        assert len(pkts) == 6
        assert {p.stream_index for p in pkts} == {0, 1}
