"""Container tests: y4m/rawvideo/image2 round trips, framecrc output
parity with the reference (FATE's comparison backbone), PNG codec."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.png.codec import decode_png, encode_png
from librempeg_tpu.core.frame import VideoFrame
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


class TestY4m:
    def _mux(self, frames, w, h, rate=Rational(25, 1)):
        mux = open_output_bytes("yuv4mpegpipe")
        mux.add_stream(CodecParameters(
            codec_type="video", codec_id="rawvideo", width=w, height=h,
            pix_fmt="yuv420p", framerate=rate),
            time_base=Rational(rate.den, rate.num))
        for i, data in enumerate(frames):
            mux.write(Packet(data=data, pts=i, dts=i, duration=1))
        mux.finish()
        return mux.io.getvalue()

    def test_roundtrip(self):
        frames = [b"".join(p.tobytes() for p in testgen.video_yuv420(32, 16, i))
                  for i in range(3)]
        blob = self._mux(frames, 32, 16)
        d = open_input_bytes(blob)
        assert d.NAME == "yuv4mpegpipe"
        st = d.streams[0]
        assert (st.codecpar.width, st.codecpar.height) == (32, 16)
        pkts = list(d.packets())
        assert len(pkts) == 3
        assert pkts[0].data == frames[0]

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_reads_our_y4m(self, tmp_path):
        frames = [b"".join(p.tobytes() for p in testgen.video_yuv420(32, 16, i))
                  for i in range(2)]
        blob = self._mux(frames, 32, 16)
        f = tmp_path / "ours.y4m"
        f.write_bytes(blob)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(f),
             "-f", "rawvideo", "-"], capture_output=True, check=True)
        assert out.stdout == b"".join(frames)

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_we_read_reference_y4m(self, tmp_path):
        y, u, v = testgen.video_yuv420(32, 16, 7)
        raw = tmp_path / "in.yuv"
        raw.write_bytes(y.tobytes() + u.tobytes() + v.tobytes())
        y4m = tmp_path / "ref.y4m"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "32x16", "-i", str(raw),
             "-y", str(y4m)], check=True)
        d = open_input(str(y4m))
        pkts = list(d.packets())
        assert len(pkts) == 1
        assert pkts[0].data == raw.read_bytes()


class TestFrameCrc:
    def test_crc_matches_reference_algorithm(self, tmp_path):
        """Our framecrc of raw video must equal the reference's framecrc
        of the same input (validates the CRC-32 variant + text format)."""
        if reference_ffmpeg() is None:
            pytest.skip("no reference")
        y, u, v = testgen.video_yuv420(32, 16, 3)
        data = y.tobytes() + u.tobytes() + v.tobytes()
        raw = tmp_path / "in.yuv"
        raw.write_bytes(data)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "32x16", "-r", "25",
             "-i", str(raw), "-f", "framecrc", "-"],
            capture_output=True, check=True)
        ref_lines = [l for l in out.stdout.decode().splitlines()
                     if l and not l.startswith("#")]

        mux = open_output_bytes("framecrc")
        mux.add_stream(CodecParameters(
            codec_type="video", codec_id="rawvideo", width=32, height=16,
            pix_fmt="yuv420p"), time_base=Rational(1, 25))
        from librempeg_tpu.core.packet import PktFlags

        mux.write(Packet(data=data, pts=0, dts=0, duration=1,
                         flags=PktFlags.KEY, time_base=Rational(1, 25)))
        mux.finish()
        our_lines = [l for l in mux.io.getvalue().decode().splitlines()
                     if l and not l.startswith("#")]
        assert our_lines == ref_lines


class TestPng:
    @pytest.mark.parametrize("fmt", ["rgb24", "rgba", "gray"])
    def test_roundtrip_bit_exact(self, fmt):
        rgb = testgen.video_rgb(33, 21, 2)
        if fmt == "gray":
            plane = rgb[..., 0].copy()
        elif fmt == "rgba":
            plane = np.dstack([rgb, np.full((21, 33), 200, np.uint8)])
        else:
            plane = rgb
        f = VideoFrame(planes=(plane,), format=fmt, width=33, height=21,
                       color_range="jpeg")
        g = decode_png(encode_png(f))
        assert g.format == fmt
        np.testing.assert_array_equal(np.asarray(g.planes[0]), plane)

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_decodes_our_png(self, tmp_path):
        rgb = testgen.video_rgb(33, 21, 4)
        f = VideoFrame(planes=(rgb,), format="rgb24", width=33, height=21,
                       color_range="jpeg")
        p = tmp_path / "ours.png"
        p.write_bytes(encode_png(f))
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(p),
             "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
            capture_output=True, check=True)
        np.testing.assert_array_equal(
            np.frombuffer(out.stdout, np.uint8).reshape(21, 33, 3), rgb)

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_we_decode_reference_png(self, tmp_path):
        rgb = testgen.video_rgb(33, 21, 5)
        raw = tmp_path / "in.raw"
        raw.write_bytes(rgb.tobytes())
        png = tmp_path / "ref.png"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "rgb24", "-s", "33x21", "-i", str(raw),
             "-y", str(png)], check=True)
        g = decode_png(png.read_bytes())
        assert g.format == "rgb24"
        np.testing.assert_array_equal(np.asarray(g.planes[0]), rgb)


class TestRawVideo:
    def test_rawvideo_demux(self, tmp_path):
        frames = [b"".join(p.tobytes() for p in testgen.video_yuv420(16, 16, i))
                  for i in range(4)]
        f = tmp_path / "in.yuv"
        f.write_bytes(b"".join(frames))
        d = open_input(str(f), format="rawvideo", width=16, height=16,
                       pix_fmt="yuv420p")
        pkts = list(d.packets())
        assert len(pkts) == 4
        assert [p.pts for p in pkts] == [0, 1, 2, 3]


class TestProtocols:
    def test_concat(self, tmp_path):
        from librempeg_tpu.formats.io import open_io

        (tmp_path / "a.bin").write_bytes(b"hello ")
        (tmp_path / "b.bin").write_bytes(b"world")
        io = open_io(f"concat:{tmp_path}/a.bin|{tmp_path}/b.bin")
        assert io.read(64) == b"hello world"

    def test_data_uri(self):
        from librempeg_tpu.formats.io import open_io

        io = open_io("data:text/plain;base64,aGVsbG8=")
        assert io.read(16) == b"hello"

    def test_md5_protocol(self, tmp_path):
        from librempeg_tpu.formats.io import open_io
        import hashlib

        out = tmp_path / "digest.txt"
        io = open_io(f"md5:{out}", "w")
        io.write(b"abc")
        io.close()
        assert out.read_text().strip() == hashlib.md5(b"abc").hexdigest()


class TestMetadata:
    """-metadata plumbing: wav LIST/INFO + matroska Title, read back by
    both our demuxers and the reference's ffprobe."""

    def _wav(self, tmp_path):
        from librempeg_tpu.cli.ffmpeg import main as ffmain

        out = tmp_path / "m.wav"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "sine=frequency=440:duration=0.1",
                       "-metadata", "title=Hello World",
                       "-metadata", "artist=TPU", "-y", str(out)]) == 0
        return out

    def test_wav_info_roundtrip(self, tmp_path):
        out = self._wav(tmp_path)
        d = open_input(str(out))
        assert d.metadata == {"title": "Hello World", "artist": "TPU"}
        # the file still decodes fully
        n = sum(len(p.data) for p in d.packets())
        assert n == int(0.1 * 44100) * 2   # mono s16

    def test_mkv_title_roundtrip(self, tmp_path):
        from librempeg_tpu.cli.ffmpeg import main as ffmain

        out = tmp_path / "m.mkv"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=0.2",
                       "-c:v", "mpeg4", "-q:v", "4",
                       "-metadata", "title=MkvTitle", "-y", str(out)]) == 0
        d = open_input(str(out))
        assert d.metadata["title"] == "MkvTitle"

    def test_reference_reads_wav_tags(self, tmp_path):
        import subprocess
        from conftest import reference_ffmpeg

        if reference_ffmpeg() is None:
            import pytest

            pytest.skip("no reference")
        out = self._wav(tmp_path)
        probe = str(reference_ffmpeg()).replace("ffmpeg", "ffprobe")
        r = subprocess.run([probe, "-v", "error", "-show_entries",
                            "format_tags", "-of", "default", str(out)],
                           capture_output=True, text=True)
        assert "TAG:title=Hello World" in r.stdout
        assert "TAG:artist=TPU" in r.stdout

    def test_mp4_ilst_roundtrip(self, tmp_path):
        from librempeg_tpu.cli.ffmpeg import main as ffmain

        out = tmp_path / "m.mp4"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=0.2",
                       "-c:v", "mpeg4", "-q:v", "4",
                       "-metadata", "title=Mp4Title",
                       "-metadata", "artist=TPU", "-y", str(out)]) == 0
        d = open_input(str(out))
        assert d.metadata == {"title": "Mp4Title", "artist": "TPU"}
