"""CLI + transcode pipeline end-to-end tests (the api-*-test analog,
SURVEY.md §4 tier 4)."""
import io
import sys

import numpy as np
import pytest

from librempeg_tpu.cli import ffmpeg as ffm
from librempeg_tpu.cli import ffprobe as ffp
from librempeg_tpu.codecs.pcm import _encode_array
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import CodecParameters, open_input, open_output
from librempeg_tpu.utils import testgen


def make_wav(path, rate=48000, n=9600):
    pcm = testgen.s16(testgen.audio_mix(rate, n))
    mux = open_output(str(path), "wav")
    mux.add_stream(CodecParameters(
        codec_type="audio", codec_id="pcm_s16le", sample_rate=rate,
        nb_channels=2, block_align=4))
    mux.write(Packet(data=_encode_array("pcm_s16le", pcm), pts=0))
    mux.close()
    return pcm


def make_y4m(path, w=64, h=48, n=5):
    mux = open_output(str(path), "yuv4mpegpipe")
    mux.add_stream(CodecParameters(
        codec_type="video", codec_id="rawvideo", width=w, height=h,
        pix_fmt="yuv420p", framerate=Rational(25, 1)),
        time_base=Rational(1, 25))
    frames = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        data = y.tobytes() + u.tobytes() + v.tobytes()
        frames.append((y, u, v))
        mux.write(Packet(data=data, pts=i, dts=i, duration=1))
    mux.close()
    return frames


class TestFfmpegCli:
    def test_wav_resample(self, tmp_path):
        make_wav(tmp_path / "in.wav")
        rc = ffm.main(["-y", "-i", str(tmp_path / "in.wav"),
                       "-ar", "44100", str(tmp_path / "out.wav")])
        assert rc == 0
        d = open_input(str(tmp_path / "out.wav"))
        assert d.streams[0].codecpar.sample_rate == 44100
        total = sum(p.duration for p in d.packets())
        assert abs(total - 8820) <= 32

    def test_y4m_scale_to_y4m(self, tmp_path):
        make_y4m(tmp_path / "in.y4m")
        rc = ffm.main(["-y", "-i", str(tmp_path / "in.y4m"),
                       "-vf", "scale=32:24",
                       str(tmp_path / "out.y4m")])
        assert rc == 0
        d = open_input(str(tmp_path / "out.y4m"))
        par = d.streams[0].codecpar
        assert (par.width, par.height) == (32, 24)
        assert len(list(d.packets())) == 5

    def test_y4m_to_jpeg_sequence(self, tmp_path):
        from librempeg_tpu.native import build as native

        if not native.available():
            pytest.skip("native ext unavailable")
        make_y4m(tmp_path / "in.y4m", n=3)
        rc = ffm.main(["-y", "-i", str(tmp_path / "in.y4m"),
                       "-c:v", "mjpeg",
                       str(tmp_path / "out%03d.jpg")])
        assert rc == 0
        import glob

        files = sorted(glob.glob(str(tmp_path / "out*.jpg")))
        assert len(files) == 3
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg

        g = decode_jpeg(open(files[0], "rb").read())
        assert (g.width, g.height) == (64, 48)

    def test_frames_limit(self, tmp_path):
        make_y4m(tmp_path / "in.y4m", n=5)
        rc = ffm.main(["-y", "-i", str(tmp_path / "in.y4m"),
                       "-frames:v", "2", str(tmp_path / "out.y4m")])
        assert rc == 0
        d = open_input(str(tmp_path / "out.y4m"))
        assert len(list(d.packets())) == 2

    def test_framecrc_output(self, tmp_path, capsys):
        make_y4m(tmp_path / "in.y4m", n=2)
        out = tmp_path / "out.crc"
        rc = ffm.main(["-y", "-i", str(tmp_path / "in.y4m"),
                       "-f", "framecrc", str(out)])
        assert rc == 0
        lines = out.read_text().splitlines()
        data_lines = [l for l in lines if not l.startswith("#")]
        assert len(data_lines) == 2
        assert data_lines[0].startswith("0, ")


class TestFfprobe:
    def test_probe_wav_json(self, tmp_path, capsys):
        make_wav(tmp_path / "in.wav")
        rc = ffp.main(["-show_format", "-show_streams", "-of", "json",
                       str(tmp_path / "in.wav")])
        assert rc == 0
        import json

        info = json.loads(capsys.readouterr().out)
        assert info["format"]["format_name"] == "wav"
        st = info["streams"][0]
        assert st["codec_name"] == "pcm_s16le"
        assert st["sample_rate"] == "48000"
        assert st["duration"].startswith("0.2")

    def test_probe_default_writer(self, tmp_path, capsys):
        make_y4m(tmp_path / "in.y4m")
        rc = ffp.main(["-show_streams", str(tmp_path / "in.y4m")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "[STREAM]" in out
        assert "codec_name=rawvideo" in out
        assert "width=64" in out

    def test_count_packets(self, tmp_path, capsys):
        make_y4m(tmp_path / "in.y4m", n=4)
        rc = ffp.main(["-show_streams", "-count_packets", "-of", "json",
                       str(tmp_path / "in.y4m")])
        import json

        info = json.loads(capsys.readouterr().out)
        assert info["streams"][0]["nb_read_packets"] == "4"


class TestFullTranscode:
    """End-to-end: our mpeg4 encoder -> AVI -> decode -> scale -> mjpeg."""

    def test_y4m_to_mpeg4_avi(self, tmp_path):
        make_y4m(tmp_path / "in.y4m", w=64, h=48, n=4)
        rc = ffm.main(["-y", "-i", str(tmp_path / "in.y4m"),
                       "-c:v", "mpeg4", "-q:v", "3",
                       str(tmp_path / "out.avi")])
        assert rc == 0
        d = open_input(str(tmp_path / "out.avi"))
        assert d.streams[0].codecpar.codec_id == "mpeg4"

    def test_mpeg4_avi_decode_scale_jpeg(self, tmp_path):
        from librempeg_tpu.native import build as native

        if not native.available():
            import pytest

            pytest.skip("native unavailable")
        make_y4m(tmp_path / "in.y4m", w=64, h=48, n=3)
        assert ffm.main(["-y", "-i", str(tmp_path / "in.y4m"),
                         "-c:v", "mpeg4", "-q:v", "2", "-g", "2",
                         str(tmp_path / "mid.avi")]) == 0
        assert ffm.main(["-y", "-i", str(tmp_path / "mid.avi"),
                         "-vf", "scale=32:24,format=yuvj420p",
                         "-c:v", "mjpeg",
                         str(tmp_path / "o%02d.jpg")]) == 0
        import glob

        files = sorted(glob.glob(str(tmp_path / "o*.jpg")))
        assert len(files) == 3
        from librempeg_tpu.codecs.jpeg.decoder import decode_jpeg

        g = decode_jpeg(open(files[0], "rb").read())
        assert (g.width, g.height) == (32, 24)


class TestStreamCopy:
    def test_copy_remux_chain(self, tmp_path):
        """-c copy across mp4 -> mkv -> mp4 keeps payloads byte-exact."""
        src = tmp_path / "src.mp4"
        assert ffm.main(["-v", "error", "-f", "lavfi",
                         "-i", "testsrc2=size=64x48:duration=0.3",
                         "-c:v", "mpeg4", "-q:v", "4", "-y",
                         str(src)]) == 0
        mkv = tmp_path / "c.mkv"
        mp4 = tmp_path / "c2.mp4"
        assert ffm.main(["-v", "error", "-i", str(src), "-c", "copy",
                         "-y", str(mkv)]) == 0
        assert ffm.main(["-v", "error", "-i", str(mkv), "-c", "copy",
                         "-y", str(mp4)]) == 0

        def payloads(p):
            d = open_input(str(p))
            return [bytes(pk.data) for pk in d.packets()]

        a, b, c = payloads(src), payloads(mkv), payloads(mp4)
        assert a == b == c and len(a) == 8


class TestMap:
    def test_map_selects_single_stream(self, tmp_path):
        """-map 0:a / -map 0:v extract one stream from an A/V input."""
        from librempeg_tpu.codecs.api import find_encoder
        from librempeg_tpu.core.rational import Rational as R
        from librempeg_tpu.utils import testgen

        # build an A/V mkv
        src = tmp_path / "av.mkv"
        enc = find_encoder("mpeg4")(width=64, height=48, qscale=4)
        mux = open_output(str(src), format="matroska")
        vst = mux.add_stream(enc.codec_parameters(), enc.time_base)
        apar = CodecParameters(codec_type="audio", codec_id="pcm_s16le",
                               sample_rate=48000, nb_channels=2,
                               sample_fmt="s16")
        ast = mux.add_stream(apar, time_base=R(1, 48000))
        for i in range(4):
            for p in enc.encode(testgen.video_frame_yuv420(64, 48, i)):
                p.stream_index = vst.index
                mux.write(p)
        pcm = testgen.s16(testgen.audio_mix(48000, 1920 * 4, 2)).T
        import numpy as np
        for i in range(0, len(pcm), 1920):
            chunk = np.ascontiguousarray(pcm[i:i + 1920])
            mux.write(Packet(data=chunk.tobytes(), pts=i, dts=i,
                             duration=len(chunk), stream_index=ast.index,
                             time_base=R(1, 48000)))
        mux.write_trailer()

        wav = tmp_path / "a.wav"
        assert ffm.main(["-v", "error", "-i", str(src), "-map", "0:a",
                         "-c:a", "pcm_s16le", "-y", str(wav)]) == 0
        d = open_input(str(wav))
        assert [s.codecpar.codec_type for s in d.streams] == ["audio"]

        m4v = tmp_path / "v.m4v"
        assert ffm.main(["-v", "error", "-i", str(src), "-map", "0:v",
                         "-y", str(m4v), "-c:v", "mpeg4", "-q:v", "4"]) == 0
        d2 = open_input(str(m4v))
        assert [s.codecpar.codec_type for s in d2.streams] == ["video"]

    def test_map_by_index(self, tmp_path):
        from librempeg_tpu.sched.pipeline import _map_matches

        class St:
            def __init__(self, idx, kind):
                self.index = idx

                class P:
                    codec_type = kind
                self.codecpar = P()

        assert _map_matches(["0:1"], St(1, "audio"), 0)
        assert not _map_matches(["0:1"], St(0, "video"), 0)
        assert _map_matches(["0:v:0"], St(0, "video"), 0)
        assert not _map_matches(["0:v:1"], St(0, "video"), 0)
        assert _map_matches(["0"], St(5, "audio"), 2)
        assert not _map_matches(["1:v"], St(0, "video"), 0)


def test_ss_decode_and_discard(tmp_path):
    """-ss on a container without read_seek (raw ES): exact decode-and-
    discard drops frames before the seek point (seek.c:290 +
    accurate-seek semantics)."""
    import numpy as np

    from librempeg_tpu.codecs.api import find_decoder, find_encoder
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational
    from librempeg_tpu.sched.pipeline import (StreamMap, TranscodeSpec,
                                              Transcoder)

    src = tmp_path / "in.m4v"
    enc = find_encoder("mpeg4")(width=64, height=48,
                                framerate=Rational(25, 1), qscale=5,
                                gop_size=5)
    data = b""
    for i in range(25):
        y = np.full((48, 64), 20 + 8 * i, np.uint8)
        u = np.full((24, 32), 128, np.uint8)
        v = np.full((24, 32), 128, np.uint8)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=64,
                       height=48, pts=i, time_base=Rational(1, 25))
        data += b"".join(bytes(p.data) for p in enc.encode(f))
    src.write_bytes(data)

    out = tmp_path / "out.avi"
    stats = Transcoder(TranscodeSpec(
        input_url=str(src), output_url=str(out), seek=0.4,
        video=StreamMap(codec="rawvideo"))).run()
    # 25 frames at 25 fps, -ss 0.4 -> frames 10..24 remain
    assert stats["frames"][0] == 15

    # decoded content of the first surviving frame matches source 10
    dm_out = __import__("librempeg_tpu.formats.api",
                        fromlist=["open_input"]).open_input(str(out))
    del find_decoder
    first_pkt = next(dm_out.packets())
    y00 = bytes(first_pkt.data)[0]          # rawvideo yuv420p luma [0,0]
    assert abs(int(y00) - (20 + 8 * 10)) <= 6


def test_progress_feed(tmp_path):
    """-progress URL emits ffmpeg-compatible key=value blocks ending
    with progress=end (fftools/ffmpeg.c:344 machine feed)."""
    import subprocess
    import sys

    out = tmp_path / "o.avi"
    feed = tmp_path / "progress.txt"
    r = subprocess.run(
        [sys.executable, "-m", "librempeg_tpu.cli.ffmpeg", "-y",
         "-f", "lavfi", "-i", "testsrc=size=64x48:duration=0.4",
         "-progress", str(feed), "-stats_period", "0.1",
         "-c:v", "mpeg4", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-400:]
    txt = feed.read_text()
    assert "progress=end" in txt
    lines = dict(ln.split("=", 1) for ln in txt.splitlines()
                 if "=" in ln)
    assert int(lines["frame"]) == 10
    assert "out_time" in lines and "speed" in lines
