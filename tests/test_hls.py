"""HLS segment muxer (hlsenc.c VOD-subset analog)."""
import glob
import os
import subprocess

import pytest

from librempeg_tpu.cli.ffmpeg import main as ffmain
from librempeg_tpu.formats.api import open_input

from conftest import reference_ffmpeg

import numpy as np

from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational


def make_hls(tmp_path, seconds=6):
    out = tmp_path / "out.m3u8"
    assert ffmain(["-v", "error", "-f", "lavfi",
                   "-i", f"testsrc2=size=64x48:duration={seconds}",
                   "-c:v", "mpeg4", "-q:v", "4", "-g", "25",
                   "-y", str(out)]) == 0
    return out


class TestHls:
    def test_playlist_and_segments(self, tmp_path):
        out = make_hls(tmp_path)
        pl = out.read_text()
        assert pl.startswith("#EXTM3U")
        assert "#EXT-X-ENDLIST" in pl
        segs = sorted(tmp_path.glob("out*.ts"))
        assert len(segs) == 3                       # 6 s / 2 s target
        names = [ln for ln in pl.splitlines() if ln.endswith(".ts")]
        assert names == [s.name for s in segs]
        # EXTINF durations ~2 s
        infs = [float(ln.split(":")[1].rstrip(","))
                for ln in pl.splitlines() if ln.startswith("#EXTINF")]
        assert all(1.5 <= d <= 2.5 for d in infs)

    def test_segments_independently_demuxable(self, tmp_path):
        out = make_hls(tmp_path)
        total = 0
        for seg in sorted(tmp_path.glob("out*.ts")):
            d = open_input(str(seg))
            pkts = list(d.packets())
            assert d.streams[0].codecpar.codec_id == "mpeg4"
            total += len(pkts)
        assert total == 150

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_decodes_every_segment(self, tmp_path):
        """Each segment must decode standalone (codec config repeated
        in-band at segment starts)."""
        out = make_hls(tmp_path)
        total = 0
        for seg in sorted(tmp_path.glob("out*.ts")):
            r = subprocess.run([reference_ffmpeg(), "-v", "error", "-i",
                                str(seg), "-f", "framecrc", "-"],
                               capture_output=True, text=True)
            assert r.returncode == 0 and r.stderr == "", seg
            total += len([ln for ln in r.stdout.splitlines()
                          if not ln.startswith("#")])
        assert total == 150


class TestDash:
    def test_mpd_and_segments(self, tmp_path):
        out = tmp_path / "out.mpd"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=4",
                       "-c:v", "mpeg4", "-q:v", "4", "-g", "25",
                       "-y", str(out)]) == 0
        mpd = out.read_text()
        assert mpd.startswith('<?xml')
        assert 'type="static"' in mpd
        assert 'mediaPresentationDuration="PT4.000S"' in mpd
        segs = sorted(tmp_path.glob("out*.ts"))
        assert len(segs) == 2
        for s in segs:
            assert f'media="{s.name}"' in mpd
        total = 0
        for seg in segs:
            d = open_input(str(seg))
            total += len(list(d.packets()))
        assert total == 100

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_decodes_dash_segments(self, tmp_path):
        out = tmp_path / "out.mpd"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=4",
                       "-c:v", "mpeg4", "-q:v", "4", "-g", "25",
                       "-y", str(out)]) == 0
        total = 0
        for seg in sorted(tmp_path.glob("out*.ts")):
            r = subprocess.run([reference_ffmpeg(), "-v", "error", "-i",
                                str(seg), "-f", "framecrc", "-"],
                               capture_output=True, text=True)
            assert r.returncode == 0 and r.stderr == ""
            total += len([ln for ln in r.stdout.splitlines()
                          if not ln.startswith("#")])
        assert total == 100


class TestHlsDashDemux:
    """HLS/DASH demuxing: our muxer's VOD output round-trips through
    the playlist/manifest resolver + TS concat + decode."""

    def _make_frames(self, n=20, w=64, h=48):
        rng = np.random.default_rng(3)
        frames = []
        for i in range(n):
            y = np.full((h, w), 50 + 8 * i, np.uint8)
            y[10:20, 10 + i:20 + i] = 220
            u = np.full((h // 2, w // 2), 120, np.uint8)
            v = np.full((h // 2, w // 2), 130, np.uint8)
            frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                     width=w, height=h, pts=i,
                                     time_base=Rational(1, 25)))
        del rng
        return frames

    def _mux(self, tmp_path, fmt):
        from librempeg_tpu.codecs.api import find_encoder
        from librempeg_tpu.formats.api import open_output

        name = "pl.m3u8" if fmt == "hls" else "man.mpd"
        out = open_output(str(tmp_path / name), fmt)
        enc = find_encoder("mpeg4")(width=64, height=48,
                                    framerate=Rational(25, 1), qscale=6,
                                    gop_size=5)
        st = out.add_stream(enc.codec_parameters(), Rational(1, 25))
        for f in self._make_frames():
            for pkt in enc.encode(f):
                out.write(pkt.replace(stream_index=st.index))
        out.finish()
        out.io.close()
        return tmp_path / name

    @pytest.mark.parametrize("fmt", ["hls", "dash"])
    def test_demux_roundtrip(self, fmt, tmp_path):
        from librempeg_tpu.codecs.api import find_decoder
        from librempeg_tpu.formats.api import open_input

        manifest = self._mux(tmp_path, fmt)
        dm = open_input(str(manifest))
        assert dm.NAME == fmt
        assert dm.streams[0].codecpar.codec_id == "mpeg4"
        dec = find_decoder("mpeg4")(dm.streams[0].codecpar)
        n = 0
        for pkt in dm.packets():
            n += len(dec.decode(pkt))
        assert n == 20
