"""Third-wave filters: biquad family, fades, echo, reverse, stack,
select, metadata setters, plane tools."""
import numpy as np
import pytest

from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.filters import GraphRunner
from tests.test_filters import aprops, vframe, vprops


def sine_frame(freq, n=4800, rate=48000, pts=0):
    t = (np.arange(n) + pts) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    data = np.stack([x, x]).astype(np.float32)
    return AudioFrame(data=data, sample_rate=rate, sample_fmt="fltp",
                      pts=pts, time_base=Rational(1, rate))


def rms(frame):
    return float(np.sqrt(np.mean(np.asarray(frame.data, float) ** 2)))


def run_audio(desc, frames, fmt="fltp"):
    g = GraphRunner(desc, aprops(fmt=fmt))
    out = []
    for f in frames:
        out += g.push(f)
    out += g.finish()
    return out


class TestBiquads:
    def test_lowpass_attenuates_high(self):
        low = run_audio("lowpass=f=500",
                        [sine_frame(100, pts=i * 4800) for i in range(4)])
        high = run_audio("lowpass=f=500",
                         [sine_frame(8000, pts=i * 4800) for i in range(4)])
        assert rms(low[-1]) > 0.3          # passband nearly untouched
        assert rms(high[-1]) < 0.05        # ~ -24 dB/oct above cutoff

    def test_highpass_attenuates_low(self):
        low = run_audio("highpass=f=2000",
                        [sine_frame(100, pts=i * 4800) for i in range(4)])
        high = run_audio("highpass=f=2000",
                         [sine_frame(8000, pts=i * 4800) for i in range(4)])
        assert rms(low[-1]) < 0.05
        assert rms(high[-1]) > 0.3

    def test_bandreject_notches(self):
        at = run_audio("bandreject=f=1000:w=1",
                       [sine_frame(1000, pts=i * 4800) for i in range(6)])
        off = run_audio("bandreject=f=1000:w=1",
                        [sine_frame(100, pts=i * 4800) for i in range(6)])
        assert rms(at[-1]) < 0.1
        assert rms(off[-1]) > 0.3

    def test_equalizer_boosts_center(self):
        boosted = run_audio("equalizer=f=1000:g=12:w=1",
                            [sine_frame(1000, pts=i * 4800)
                             for i in range(6)])
        assert rms(boosted[-1]) > 0.45 / 0.354 * 0.354 * 1.5  # > +3 dB

    def test_biquad_identity_exact(self):
        f = sine_frame(440)
        out = run_audio("biquad=b0=1:b1=0:b2=0:a0=1:a1=0:a2=0", [f])
        np.testing.assert_allclose(np.asarray(out[0].data),
                                   np.asarray(f.data), atol=1e-6)

    def test_state_carries_across_frames(self):
        # filtering two chunks must equal filtering their concatenation
        one = sine_frame(700, n=9600)
        chunks = [sine_frame(700, n=4800),
                  sine_frame(700, n=4800, pts=4800)]
        whole = run_audio("lowpass=f=900", [one])
        split = run_audio("lowpass=f=900", chunks)
        got = np.concatenate([np.asarray(f.data) for f in split], axis=1)
        np.testing.assert_allclose(got, np.asarray(whole[0].data),
                                   atol=1e-5)

    def test_allpass_preserves_magnitude(self):
        out = run_audio("allpass=f=1000",
                        [sine_frame(1000, pts=i * 4800) for i in range(4)])
        assert abs(rms(out[-1]) - 0.5 / np.sqrt(2)) < 0.02


class TestFades:
    def test_fade_in_first_frame_black(self):
        g = GraphRunner("fade=in:0:10", vprops())
        out = g.push(vframe(0).replace(pts=0))
        y = np.asarray(out[0].planes[0])
        assert np.all(y == 0)

    def test_fade_out_end_black(self):
        g = GraphRunner("fade=out:0:5", vprops())
        outs = []
        for i in range(8):
            outs += g.push(vframe(1).replace(pts=i))
        assert np.all(np.asarray(outs[-1].planes[0]) == 0)
        assert np.all(np.abs(np.asarray(outs[-1].planes[1]).astype(int)
                             - 128) <= 1)

    def test_afade_in_ramp(self):
        f = sine_frame(440, n=4800)
        out = run_audio("afade=t=in:ss=0:ns=4800", [f])
        y = np.asarray(out[0].data)
        a = float(np.max(np.abs(y[:, :480])))
        b = float(np.max(np.abs(y[:, -480:])))
        assert a < 0.1 and b > 0.4


class TestEchoReverse:
    def test_aecho_adds_delayed_copy(self):
        # impulse -> dry + echo at +100ms
        imp = np.zeros((2, 9600), np.float32)
        imp[:, 0] = 0.8
        f = AudioFrame(data=imp, sample_rate=48000, sample_fmt="fltp",
                       pts=0, time_base=Rational(1, 48000))
        out = run_audio("aecho=0.6:0.3:100:0.5", [f])
        y = np.asarray(out[0].data)[0]
        assert abs(y[0] - 0.8 * 0.6 * 0.5) < 1e-3       # dry * in * out/in
        assert abs(y[4800] - 0.8 * 0.5 * 0.5) < 1e-3    # echo tap
        assert np.max(np.abs(y[1:4800])) < 1e-6

    def test_reverse_video(self):
        g = GraphRunner("reverse", vprops())
        frames = [vframe(i).replace(pts=i) for i in range(4)]
        outs = []
        for f in frames:
            outs += g.push(f)
        outs += g.finish()
        assert len(outs) == 4
        np.testing.assert_array_equal(np.asarray(outs[0].planes[0]),
                                      frames[3].planes[0])
        assert [f.pts for f in outs] == [0, 1, 2, 3]  # pts stay monotonic

    def test_areverse_samples(self):
        f = sine_frame(440, n=1000)
        out = run_audio("areverse", [f])
        np.testing.assert_allclose(np.asarray(out[0].data),
                                   np.asarray(f.data)[:, ::-1], atol=1e-7)


class TestStacks:
    def test_hstack(self):
        g = GraphRunner("hstack", [vprops(), vprops()])
        a, b = vframe(0), vframe(1)
        outs = g.push(a, 0)
        assert outs == []
        outs = g.push(b, 1)
        assert len(outs) == 1
        y = np.asarray(outs[0].planes[0])
        assert y.shape == (48, 128)
        np.testing.assert_array_equal(y[:, :64], a.planes[0])
        np.testing.assert_array_equal(y[:, 64:], b.planes[0])
        assert outs[0].width == 128

    def test_vstack(self):
        g = GraphRunner("vstack", [vprops(), vprops()])
        g.push(vframe(0), 0)
        outs = g.push(vframe(0), 1)
        assert np.asarray(outs[0].planes[0]).shape == (96, 64)
        assert outs[0].height == 96


class TestSelectMeta:
    def test_select_every_other(self):
        g = GraphRunner("select=mod(n\\,2)", vprops())
        outs = []
        for i in range(6):
            outs += g.push(vframe(i).replace(pts=i))
        assert [f.pts for f in outs] == [1, 3, 5]

    def test_setsar(self):
        g = GraphRunner("setsar=4/3", vprops())
        out = g.push(vframe(0))[0]
        assert out.sample_aspect_ratio == Rational(4, 3)
        assert g.output_props.sample_aspect_ratio == Rational(4, 3)

    def test_asetrate(self):
        f = sine_frame(440, n=1000)
        g = GraphRunner("asetrate=24000", aprops(fmt="fltp"))
        out = g.push(f)[0]
        assert out.sample_rate == 24000
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.asarray(f.data))


class TestPlaneTools:
    def test_extractplanes_single(self):
        g = GraphRunner("extractplanes=u", vprops())
        f = vframe(2)
        out = g.push(f)[0]
        assert out.format == "gray"
        assert (out.width, out.height) == (32, 24)
        np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                      f.planes[1])

    def test_shuffleplanes_swap_chroma(self):
        g = GraphRunner("shuffleplanes=0:2:1", vprops())
        f = vframe(2)
        out = g.push(f)[0]
        np.testing.assert_array_equal(np.asarray(out.planes[1]),
                                      f.planes[2])
        np.testing.assert_array_equal(np.asarray(out.planes[2]),
                                      f.planes[1])


class TestConcat:
    def test_concat_video(self):
        g = GraphRunner("concat=n=2:v=1:a=0", [vprops(), vprops()])
        for i in range(3):
            g.push(vframe(i).replace(pts=i), 0)
        for i in range(2):
            g.push(vframe(i + 3).replace(pts=i), 1)
        outs = g.finish()
        assert [f.pts for f in outs] == [0, 1, 2, 3, 4]
        np.testing.assert_array_equal(np.asarray(outs[3].planes[0]),
                                      vframe(3).planes[0])

    def test_concat_audio(self):
        g = GraphRunner("concat=n=2:v=0:a=1",
                        [aprops(fmt="fltp"), aprops(fmt="fltp")])
        a = sine_frame(440, n=4800, pts=0)
        b = sine_frame(880, n=2400, pts=0)
        g.push(a, 0)
        g.push(b, 1)
        outs = g.finish()
        assert len(outs) == 2
        assert outs[0].pts == 0
        assert outs[1].pts == 4800     # rebased past segment 0


class TestAnalyzersMerge:
    def test_volumedetect_sine(self):
        g = GraphRunner("volumedetect", aprops(fmt="fltp"))
        g.push(sine_frame(440, n=48000))
        g.finish()
        st = g.entry_nodes[0].filter.stats
        assert abs(st["max_volume"] - (-6.02)) < 0.05   # 0.5 amp
        assert abs(st["mean_volume"] - (-9.03)) < 0.05  # sine RMS
        assert st["n_samples"] == 96000

    def test_astats_sine(self):
        g = GraphRunner("astats", aprops(fmt="fltp"))
        g.push(sine_frame(440, n=48000))
        g.finish()
        st = g.entry_nodes[0].filter.stats["channels"][0]
        assert abs(st["crest_factor"] - np.sqrt(2)) < 0.01
        assert abs(st["dc_offset"]) < 1e-3
        assert st["zero_crossings"] > 800        # ~2*440 per second

    def test_amerge_stacks_channels(self):
        g = GraphRunner("amerge", [aprops(fmt="fltp"), aprops(fmt="fltp")])
        a = sine_frame(440, n=1000)
        b = sine_frame(880, n=1000)
        g.push(a, 0)
        out = g.push(b, 1)
        y = np.asarray(out[0].data)
        assert y.shape == (4, 1000)
        np.testing.assert_array_equal(y[:2], np.asarray(a.data))
        np.testing.assert_array_equal(y[2:], np.asarray(b.data))
        assert out[0].layout.nb_channels == 4


class TestTimeTools:
    def test_loop_video(self):
        g = GraphRunner("loop=loop=2:size=2:start=1", vprops())
        frames = [vframe(i).replace(pts=i, duration=1) for i in range(4)]
        outs = []
        for f in frames:
            outs += g.push(f)
        outs += g.finish()
        # 0 1 2 | 1 2 | 1 2 | 3
        assert len(outs) == 8
        order = [int(np.asarray(f.planes[0])[0, 0]) for f in outs]
        want = [int(np.asarray(frames[i].planes[0])[0, 0])
                for i in (0, 1, 2, 1, 2, 1, 2, 3)]
        assert order == want
        assert [f.pts for f in outs] == list(range(8))

    def test_aloop(self):
        g = GraphRunner("aloop=loop=1:size=1000:start=0", aprops(fmt="fltp"))
        f = sine_frame(440, n=1000)
        outs = g.push(f)
        outs += g.finish()
        assert len(outs) == 2
        np.testing.assert_array_equal(np.asarray(outs[1].data),
                                      np.asarray(f.data))
        assert outs[1].pts == 1000

    def test_tpad_clone_stop(self):
        g = GraphRunner("tpad=start=2:stop=1:start_mode=add:stop_mode=clone",
                        vprops())
        outs = []
        for i in range(2):
            outs += g.push(vframe(i).replace(pts=i))
        outs += g.finish()
        assert len(outs) == 5          # 2 black + 2 real + 1 cloned
        assert np.all(np.asarray(outs[0].planes[0]) == 0)
        np.testing.assert_array_equal(np.asarray(outs[-1].planes[0]),
                                      vframe(1).planes[0])
        assert [f.pts for f in outs] == list(range(5))

    def test_settb_rescales_pts(self):
        g = GraphRunner("settb=1/1000", vprops())
        out = g.push(vframe(0).replace(pts=5))[0]  # 5/25 s = 200 ms
        assert out.time_base == Rational(1, 1000)
        assert out.pts == 200


class TestShowInfo:
    def test_showinfo_checksums(self):
        import zlib
        g = GraphRunner("showinfo", vprops())
        f = vframe(1).replace(pts=3)
        out = g.push(f)
        assert len(out) == 1
        rec = g.entry_nodes[0].filter.records[0]
        assert rec["pts"] == 3 and rec["size"] == (64, 48)
        want = zlib.adler32(np.ascontiguousarray(f.planes[0]).tobytes(), 0)
        assert rec["plane_checksum"][0] == want & 0xFFFFFFFF

    def test_ashowinfo(self):
        g = GraphRunner("ashowinfo", aprops(fmt="fltp"))
        f = sine_frame(440, n=1000)
        g.push(f)
        rec = g.entry_nodes[0].filter.records[0]
        assert rec["nb_samples"] == 1000 and rec["channels"] == 2


class TestTileThumbnail:
    def test_tile_grid(self):
        g = GraphRunner("tile=2x2", vprops())
        frames = [vframe(i).replace(pts=i) for i in range(4)]
        outs = []
        for f in frames:
            outs += g.push(f)
        assert len(outs) == 1
        y = np.asarray(outs[0].planes[0])
        assert y.shape == (96, 128)
        np.testing.assert_array_equal(y[:48, :64], frames[0].planes[0])
        np.testing.assert_array_equal(y[48:, 64:], frames[3].planes[0])
        assert g.output_props.width == 128

    def test_tile_pads_short_batch(self):
        g = GraphRunner("tile=2x1", vprops())
        outs = g.push(vframe(0))
        outs += g.finish()
        y = np.asarray(outs[0].planes[0])
        assert np.all(y[:, 64:] == 0)       # right half padded black

    def test_thumbnail_picks_representative(self):
        g = GraphRunner("thumbnail=4", vprops())
        # three similar frames + one outlier (all white)
        frames = [vframe(1).replace(pts=i) for i in range(3)]
        white = vframe(1).replace(pts=3, planes=(
            np.full((48, 64), 255, np.uint8),
            np.full((24, 32), 128, np.uint8),
            np.full((24, 32), 128, np.uint8)))
        outs = []
        for f in frames + [white]:
            outs += g.push(f)
        assert len(outs) == 1
        assert outs[0].pts in (0, 1, 2)     # outlier not chosen
