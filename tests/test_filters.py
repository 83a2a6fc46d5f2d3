"""Filter graph tests: parser, negotiation, scheduling, filters."""
import numpy as np
import pytest

from librempeg_tpu.core.frame import AudioFrame, VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.core.samplefmt import ChannelLayout
from librempeg_tpu.filters import GraphRunner, StreamProps, parse_description
from librempeg_tpu.filters.graph import BufferSink, FilterGraph
from librempeg_tpu.utils import testgen


def vprops(w=64, h=48, fmt="yuv420p"):
    return StreamProps(media="video", width=w, height=h, pix_fmt=fmt,
                       frame_rate=Rational(25, 1),
                       time_base=Rational(1, 25))


def aprops(rate=48000, fmt="s16p", ch=2):
    return StreamProps(media="audio", sample_rate=rate, sample_fmt=fmt,
                       layout=ChannelLayout.default(ch),
                       time_base=Rational(1, rate))


def vframe(i=0, w=64, h=48):
    return testgen.video_frame_yuv420(w, h, i)


class TestParser:
    def test_simple_chain(self):
        chains = parse_description("scale=320:240,format=rgb24")
        assert len(chains) == 1
        assert [f.name for f in chains[0]] == ["scale", "format"]
        assert chains[0][0].args == "320:240"

    def test_labels(self):
        chains = parse_description(
            "[in]scale=2:2[a];[a][b]overlay[out];[in2]null[b]")
        assert chains[0][0].in_labels == ["in"]
        assert chains[0][0].out_labels == ["a"]
        assert chains[1][0].in_labels == ["a", "b"]

    def test_no_args(self):
        chains = parse_description("null")
        assert chains[0][0].name == "null"
        assert chains[0][0].args == ""


class TestVideoGraphs:
    def test_null_passthrough(self):
        g = GraphRunner("null", vprops())
        f = vframe(0)
        out = g.push(f)
        assert len(out) == 1
        np.testing.assert_array_equal(np.asarray(out[0].planes[0]),
                                      f.planes[0])

    def test_scale_chain(self):
        g = GraphRunner("scale=32:24,format=rgb24", vprops())
        out = g.push(vframe(1))
        assert len(out) == 1
        assert out[0].format == "rgb24"
        assert out[0].planes[0].shape == (24, 32, 3)
        assert g.output_props.width == 32

    def test_scale_negative_keeps_aspect(self):
        g = GraphRunner("scale=32:-1", vprops(64, 48))
        out = g.push(vframe(0))
        assert (out[0].width, out[0].height) == (32, 24)

    def test_crop(self):
        g = GraphRunner("crop=32:16:8:8", vprops())
        out = g.push(vframe(2))
        assert (out[0].width, out[0].height) == (32, 16)
        np.testing.assert_array_equal(
            np.asarray(out[0].planes[0]),
            np.asarray(vframe(2).planes[0])[8:24, 8:40])

    def test_pad(self):
        g = GraphRunner("pad=96:64:16:8", vprops())
        out = g.push(vframe(0))
        assert (out[0].width, out[0].height) == (96, 64)
        np.testing.assert_array_equal(
            np.asarray(out[0].planes[0])[8:56, 16:80],
            np.asarray(vframe(0).planes[0]))

    def test_flip_involution(self):
        g = GraphRunner("hflip,hflip,vflip,vflip", vprops())
        f = vframe(3)
        out = g.push(f)
        np.testing.assert_array_equal(np.asarray(out[0].planes[0]),
                                      f.planes[0])

    def test_transpose(self):
        g = GraphRunner("transpose=1", vprops())
        out = g.push(vframe(0))
        assert (out[0].width, out[0].height) == (48, 64)

    def test_trim_frames(self):
        g = GraphRunner("trim=start_frame=1:end_frame=3", vprops())
        outs = []
        for i in range(5):
            outs += g.push(vframe(i).replace(pts=i))
        assert [f.pts for f in outs] == [1, 2]

    def test_setpts(self):
        g = GraphRunner("setpts=PTS+10", vprops())
        out = g.push(vframe(0).replace(pts=5))
        assert out[0].pts == 15

    def test_fps_downsample(self):
        g = GraphRunner("fps=5", vprops())  # input 25 fps
        outs = []
        for i in range(25):
            outs += g.push(vframe(i).replace(pts=i))
        outs += g.finish()
        assert len(outs) == 5
        assert [f.pts for f in outs] == [0, 1, 2, 3, 4]

    def test_overlay_two_inputs(self):
        g = GraphRunner("[in][in2]overlay=8:8", [vprops(), vprops(16, 16)])
        main = vframe(0)
        logo = testgen.video_frame_yuv420(16, 16, 9)
        g.push(logo, input_index=1)
        out = g.push(main, input_index=0)
        assert len(out) == 1
        np.testing.assert_array_equal(
            np.asarray(out[0].planes[0])[8:24, 8:24],
            np.asarray(logo.planes[0]))

    def test_psnr_two_inputs(self):
        from librempeg_tpu.filters.graph import BufferSource

        graph = FilterGraph()
        s1 = graph.add_instance(BufferSource(vprops()))
        s2 = graph.add_instance(BufferSource(vprops()))
        p = graph.add("psnr")
        sink = BufferSink("video")
        sn = graph.add_instance(sink)
        graph.link(s1, 0, p, 0)
        graph.link(s2, 0, p, 1)
        graph.link(p, 0, sn, 0)
        graph.configure()
        s1.out_links[0].queue.append(vframe(0))
        s2.out_links[0].queue.append(vframe(0))
        graph.run()
        assert p.filter.stats[0]["psnr_avg"] == 99.0


class TestSources:
    def test_testsrc2(self):
        g = FilterGraph()
        src = g.add("testsrc2", "size=32x16:rate=10:duration=0.3")
        sink = BufferSink("video")
        sn = g.add_instance(sink)
        g.link(src, 0, sn, 0)
        g.configure()
        while g.pump_sources():
            pass
        assert len(sink.frames) == 3
        assert sink.frames[0].width == 32

    def test_sine(self):
        g = FilterGraph()
        src = g.add("sine", "frequency=1000:sample_rate=8000:duration=0.5")
        sink = BufferSink("audio")
        sn = g.add_instance(sink)
        g.link(src, 0, sn, 0)
        g.configure()
        while g.pump_sources():
            pass
        total = sum(f.nb_samples for f in sink.frames)
        assert total == 4000


class TestAudioGraphs:
    def _aframe(self, i, n=1024):
        data = testgen.s16(testgen.audio_mix(48000, n))
        return AudioFrame(data=data, sample_rate=48000, sample_fmt="s16p",
                          pts=i * n)

    def test_anull(self):
        g = GraphRunner("anull", aprops())
        f = self._aframe(0)
        out = g.push(f)
        np.testing.assert_array_equal(np.asarray(out[0].data), f.data)

    def test_volume(self):
        g = GraphRunner("volume=0.5", aprops())
        f = self._aframe(0)
        out = g.push(f)
        expect = np.clip(np.rint(
            (np.asarray(f.data) / 32768.0 * 0.5) * 32768.0),
            -32768, 32767).astype(np.int16)
        np.testing.assert_allclose(np.asarray(out[0].data), expect, atol=1)

    def test_aresample_graph(self):
        g = GraphRunner("aresample=44100", aprops())
        outs = []
        for i in range(10):
            outs += g.push(self._aframe(i, 4800))
        outs += g.finish()
        total = sum(f.nb_samples for f in outs)
        assert total == 44100
        assert g.output_props.sample_rate == 44100

    def test_atrim(self):
        g = GraphRunner("atrim=start=0.1:end=0.2", aprops())
        outs = []
        for i in range(10):
            outs += g.push(self._aframe(i, 4800))
        total = sum(f.nb_samples for f in outs)
        assert total == 4800  # 0.1 s at 48 kHz
