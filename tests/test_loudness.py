"""EBU R128 metering + loudnorm tests (validated against the BS.1770
reference property: a -23 LUFS 997 Hz sine measures ~-23 LUFS)."""
import numpy as np
import pytest

from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.filters import GraphRunner
from librempeg_tpu.filters.loudness import measure_r128
from tests.test_filters import aprops


def sine(amp_db, rate=48000, secs=3, freq=997.0):
    t = np.arange(int(rate * secs)) / rate
    a = 10 ** (amp_db / 20)
    x = a * np.sin(2 * np.pi * freq * t)
    return np.stack([x, x]).astype(np.float32)


class TestR128:
    def test_sine_loudness(self):
        """BS.1770: a full-scale 997 Hz stereo sine reads ~ -0.69 + 10
        log10(2 * 0.5) ~= -0.69 LUFS; at -23 dBFS ~= -23.7 LUFS."""
        x = sine(-23.0)
        m = measure_r128(x, 48000)
        assert abs(m["I"] - (-23.7)) < 1.0, m["I"]

    def test_silence_gated(self):
        x = np.zeros((2, 48000), np.float32)
        m = measure_r128(x, 48000)
        assert m["I"] <= -70.0

    def test_gating_ignores_silence_padding(self):
        """Integrated loudness of tone+silence ~ tone alone (gating)."""
        tone = sine(-20.0, secs=2)
        padded = np.concatenate(
            [tone, np.zeros((2, 96000), np.float32)], axis=1)
        m1 = measure_r128(tone, 48000)
        m2 = measure_r128(padded, 48000)
        assert abs(m1["I"] - m2["I"]) < 1.0

    def test_441k_resampled_path(self):
        x = sine(-23.0, rate=44100)
        m = measure_r128(x, 44100)
        assert abs(m["I"] - (-23.7)) < 1.5


class TestLoudnorm:
    def test_normalizes_to_target(self):
        g = GraphRunner("loudnorm=I=-16", aprops(fmt="fltp"))
        x = sine(-30.0)
        f = AudioFrame(data=x, sample_rate=48000, sample_fmt="fltp", pts=0)
        outs = g.push(f)
        outs += g.finish()
        y = np.concatenate([np.asarray(o.data) for o in outs], axis=1)
        m = measure_r128(y, 48000)
        assert abs(m["I"] - (-16.0)) < 1.5, m["I"]

    def test_peak_ceiling_respected(self):
        g = GraphRunner("loudnorm=I=-5:TP=-2", aprops(fmt="fltp"))
        x = sine(-20.0)
        f = AudioFrame(data=x, sample_rate=48000, sample_fmt="fltp", pts=0)
        outs = g.push(f) + g.finish()
        y = np.concatenate([np.asarray(o.data) for o in outs], axis=1)
        peak_db = 20 * np.log10(np.max(np.abs(y)))
        assert peak_db <= -1.9

    def test_ebur128_stats(self):
        g = GraphRunner("ebur128", aprops(fmt="fltp"))
        x = sine(-23.0)
        f = AudioFrame(data=x, sample_rate=48000, sample_fmt="fltp", pts=0)
        g.push(f)
        g.finish()
        # find the filter node to read stats
        node = next(n for n in g.graph.nodes
                    if n.filter.NAME == "ebur128")
        assert abs(node.filter.stats["I"] - (-23.7)) < 1.0
