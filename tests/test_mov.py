"""MP4 mux/demux tests, cross-validated with the reference."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_encoder
from librempeg_tpu.core.frame import AudioFrame, VideoFrame
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import (
    CodecParameters,
    open_input,
    open_input_bytes,
    open_output_bytes,
)
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def build_mp4(n=6):
    """mpeg4 video + aac audio in mp4."""
    venc = find_encoder("mpeg4")(width=64, height=48, qscale=3,
                                 framerate=Rational(25, 1))
    aenc = find_encoder("aac")(sample_rate=44100, channels=2)
    mux = open_output_bytes("mp4")
    vst = mux.add_stream(venc.codec_parameters(), Rational(1, 25))
    ast = mux.add_stream(aenc.codec_parameters(), Rational(1, 44100))
    vframes = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(64, 48, i)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=64,
                       height=48, pts=i, time_base=Rational(1, 25))
        vframes.append(f)
        for pkt in venc.encode(f):
            mux.write(pkt.replace(stream_index=vst.index))
    pcm = testgen.audio_mix(44100, 44100 * n // 25)
    for pkt in aenc.packets([AudioFrame(data=pcm, sample_rate=44100,
                                        sample_fmt="fltp", pts=0)]):
        mux.write(pkt.replace(stream_index=ast.index))
    mux.finish()
    return mux.io.getvalue()


class TestMp4:
    def test_mux_demux_roundtrip(self):
        blob = build_mp4()
        d = open_input_bytes(blob)
        assert d.NAME == "mov"
        types = sorted(s.codecpar.codec_type for s in d.streams)
        assert types == ["audio", "video"]
        pkts = list(d.packets())
        v = [p for p in pkts if
             d.streams[p.stream_index].codecpar.codec_type == "video"]
        assert len(v) == 6

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_decodes_our_mp4(self, tmp_path):
        blob = build_mp4()
        f = tmp_path / "ours.mp4"
        f.write_bytes(blob)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(f),
             "-map", "0:v:0", "-f", "rawvideo", "-"],
            capture_output=True)
        assert out.returncode == 0, out.stderr.decode()[:400]
        fsz = 64 * 48 * 3 // 2
        assert len(out.stdout) == 6 * fsz
        # luma sanity vs source
        y0, _, _ = testgen.video_yuv420(64, 48, 0)
        got = np.frombuffer(out.stdout[:64 * 48], np.uint8).reshape(48, 64)
        mse = np.mean((got.astype(float) - y0.astype(float)) ** 2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 30

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_we_demux_reference_mp4(self, tmp_path):
        y, u, v = testgen.video_yuv420(64, 48, 0)
        raw = tmp_path / "in.yuv"
        raw.write_bytes((y.tobytes() + u.tobytes() + v.tobytes()) * 4)
        mp4 = tmp_path / "ref.mp4"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "64x48", "-i", str(raw),
             "-c:v", "mpeg4", "-q:v", "3", "-y", str(mp4)], check=True)
        d = open_input(str(mp4))
        st = d.streams[0]
        assert st.codecpar.codec_id == "mpeg4"
        assert (st.codecpar.width, st.codecpar.height) == (64, 48)
        pkts = list(d.packets())
        assert len(pkts) == 4


class TestMovSeek:
    def test_seek_snaps_to_keyframe(self, tmp_path):
        import jax  # noqa: F401  (conftest pins cpu)
        from librempeg_tpu.cli.ffmpeg import main as ffmain
        from librempeg_tpu.formats.api import open_input

        out = tmp_path / "s.mp4"
        # gop 4 -> keyframes at 0, 4, 8
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=0.4",
                       "-c:v", "mpeg4", "-q:v", "4", "-g", "4",
                       "-y", str(out)]) == 0
        d = open_input(str(out))
        st = d.streams[0]
        # seek to the 6th frame's time -> must land on keyframe 4
        d.read_seek(0, 6 * st.extra_samples[0][2])
        from librempeg_tpu.core.packet import PktFlags

        p = d.read_packet()
        assert bool(p.flags & PktFlags.KEY)
        assert p.pts == 4 * st.extra_samples[0][2]
        # seek back to zero
        d.read_seek(0, 0)
        assert d.read_packet().pts == 0
