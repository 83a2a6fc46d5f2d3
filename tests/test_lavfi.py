"""lavfi virtual input device (libavdevice/lavfi.c analog)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.cli.ffmpeg import main as ffmain
from librempeg_tpu.formats.api import open_input

from conftest import reference_ffmpeg


class TestLavfi:
    def test_video_source(self):
        d = open_input("testsrc2=size=64x48:rate=25:duration=0.2",
                       format="lavfi")
        par = d.streams[0].codecpar
        assert (par.codec_id, par.width, par.height) == ("rawvideo", 64, 48)
        pkts = list(d.packets())
        assert len(pkts) == 5
        assert all(len(p.data) == 64 * 48 * 3 // 2 for p in pkts)
        assert [p.pts for p in pkts] == [0, 1, 2, 3, 4]

    def test_audio_source(self):
        d = open_input("sine=frequency=440:duration=0.1", format="lavfi")
        par = d.streams[0].codecpar
        assert par.codec_id == "pcm_f32le"
        pkts = list(d.packets())
        total = sum(len(p.data) for p in pkts) // 4 // par.nb_channels
        assert total == int(0.1 * par.sample_rate)
        # waveform is a real sine at 440 Hz
        x = np.frombuffer(b"".join(bytes(p.data) for p in pkts), "<f4")
        assert 0.2 < np.max(np.abs(x)) <= 1.0

    def test_graph_with_filters(self):
        d = open_input("testsrc2=size=64x48:duration=0.2,negate,hflip",
                       format="lavfi")
        pkts = list(d.packets())
        assert len(pkts) == 5

    def test_cli_transcode(self, tmp_path):
        out = tmp_path / "o.mp4"
        rc = ffmain(["-v", "error", "-f", "lavfi",
                     "-i", "testsrc2=size=64x48:duration=0.4",
                     "-c:v", "mpeg4", "-q:v", "4", "-y", str(out)])
        assert rc == 0 and out.stat().st_size > 500

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_decodes_cli_output(self, tmp_path):
        out = tmp_path / "o.mp4"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=0.4",
                       "-c:v", "mpeg4", "-q:v", "4", "-y", str(out)]) == 0
        r = subprocess.run([reference_ffmpeg(), "-v", "error", "-i",
                            str(out), "-f", "framecrc", "-"],
                           capture_output=True, text=True)
        assert r.returncode == 0 and r.stderr == ""
        body = [ln for ln in r.stdout.splitlines() if not ln.startswith("#")]
        assert len(body) == 10
