"""Two-phase format negotiation + framesync (VERDICT r1 items 8/9):
downstream constraints reach upstream through non-converting filters,
converters auto-insert on conflicts, N-input filters align by pts."""
import numpy as np
import pytest

from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.filters.filter import StreamProps
from librempeg_tpu.filters.graph import GraphRunner


def vprops(w=64, h=48, fmt="yuv420p"):
    return StreamProps(media="video", width=w, height=h, pix_fmt=fmt,
                       time_base=Rational(1, 25))


def vframe(w=64, h=48, fmt="yuv420p", val=128, pts=0):
    if fmt == "rgb24":
        planes = (np.full((h, w, 3), val, np.uint8),)
    elif fmt == "gray":
        planes = (np.full((h, w), val, np.uint8),)
    else:
        planes = (np.full((h, w), val, np.uint8),
                  np.full((h // 2, w // 2), 128, np.uint8),
                  np.full((h // 2, w // 2), 128, np.uint8))
    return VideoFrame(planes=planes, format=fmt, width=w, height=h,
                      pts=pts, time_base=Rational(1, 25))


class TestNegotiation:
    def test_verdict_graph_no_manual_converters(self):
        """[0]scale[a];[1][a]overlay,format=rgb24 negotiates end-to-end."""
        g = GraphRunner("[in]scale=16:16[a];[in2][a]overlay,format=rgb24",
                        [vprops(), vprops(32, 32)])
        assert g.output_props.pix_fmt == "rgb24"
        g.push(vframe(), 0)
        out = g.push(vframe(32, 32, val=60, pts=0), 1)
        assert out and out[0].format == "rgb24"

    def test_rgb_sources_into_yuv_only_overlay(self):
        """overlay is planar-yuv only; rgb24 sources force auto-inserted
        converters on BOTH inputs (two-phase back-propagation)."""
        g = GraphRunner("[in][in2]overlay=0:0",
                        [vprops(fmt="rgb24"), vprops(16, 16, fmt="rgb24")])
        assert g.output_props.pix_fmt == "yuv420p"   # preference order,
        # never an arbitrary (color-discarding) pick
        names = [n.name for n in g.graph.nodes]
        assert sum("auto_conv" in n for n in names) >= 2
        g.push(vframe(fmt="rgb24", val=200), 0)
        out = g.push(vframe(16, 16, fmt="rgb24", val=10), 1)
        assert out
        y = np.asarray(out[0].planes[0])
        assert y[0, 0] < 100 < y[32, 32]    # overlay applied post-convert

    def test_same_format_graph_inserts_nothing(self):
        g = GraphRunner("[in][in2]overlay=0:0",
                        [vprops(), vprops(16, 16)])
        names = [n.name for n in g.graph.nodes]
        assert not any("auto_conv" in n for n in names)


class TestFramesync:
    def test_sparse_overlay_holds_last(self):
        """Main at 25fps, overlay only at pts 0 and 3: frames 0-2 blend
        the first overlay, 3-5 the second (hold-last semantics)."""
        g = GraphRunner("[in][in2]overlay=0:0",
                        [vprops(), vprops(16, 16)])
        outs = []
        g.push(vframe(16, 16, val=10, pts=0), 1)
        g.push(vframe(16, 16, val=240, pts=3), 1)
        for i in range(6):
            outs += g.push(vframe(val=128, pts=i), 0)
        outs += g.finish()
        assert len(outs) == 6
        vals = [int(np.asarray(f.planes[0])[4, 4]) for f in outs]
        assert vals[0] == vals[1] == vals[2] == 10
        assert vals[3] == vals[4] == vals[5] == 240

    def test_psnr_aligns_by_pts(self):
        g = GraphRunner("[in][in2]psnr", [vprops(), vprops()])
        # reference stream at half rate
        g.push(vframe(val=100, pts=0), 1)
        g.push(vframe(val=102, pts=2), 1)
        for i in range(4):
            g.push(vframe(val=100 + i, pts=i), 0)
        g.finish()
        psnr = g.graph.nodes[2].filter  # in, in2, psnr, out
        stats = [n.filter for n in g.graph.nodes
                 if n.filter.NAME == "psnr"][0].stats
        assert len(stats) == 4
        # frame0 vs ref0 identical -> 99dB; frame1 vs ref0 differs
        assert stats[0]["psnr_y"] == 99.0
        assert stats[1]["psnr_y"] < 99.0
        # frame2 matched against ref@pts2 (value 102)
        assert stats[2]["psnr_y"] == 99.0


class TestFusion:
    def test_pure_chain_fuses_to_one_node(self):
        g = GraphRunner("negate,hflip,vflip,eq=brightness=0.05,negate",
                        vprops())
        fused = [n for n in g.graph.nodes if n.name.startswith("fused:")]
        assert len(fused) == 1
        assert fused[0].name.count("+") == 4      # 5 filters in one node
        # interior nodes removed from the graph
        assert len(g.graph.nodes) == 3            # in, fused, out

    @staticmethod
    def _unfused_runner(desc, props):
        import librempeg_tpu.filters.graph as gm
        from librempeg_tpu.filters.parser import build_graph

        r = object.__new__(GraphRunner)
        r.graph = gm.FilterGraph(fuse=False)
        r.sources = [r.graph.add_instance(gm.BufferSource(props), "in0")]
        _, exit_node, exit_pad = build_graph(r.graph, desc, r.sources)
        r.sink = gm.BufferSink("video")
        sink_node = r.graph.add_instance(r.sink, "out")
        r.graph.link(exit_node, exit_pad, sink_node, 0)
        r.graph.configure()
        return r

    def test_fused_equals_unfused(self):
        import numpy as np

        rng = np.random.default_rng(5)
        desc = "negate,hflip,eq=contrast=1.2:brightness=-0.02,vflip"
        fused_g = GraphRunner(desc, vprops())
        unfused_g = self._unfused_runner(desc, vprops())
        assert not any(n.name.startswith("fused:")
                       for n in unfused_g.graph.nodes)

        for i in range(3):
            y = rng.integers(0, 256, (48, 64), np.uint8)
            u = rng.integers(0, 256, (24, 32), np.uint8)
            v = rng.integers(0, 256, (24, 32), np.uint8)
            f = VideoFrame(planes=(y, u, v), format="yuv420p", width=64,
                           height=48, pts=i, time_base=Rational(1, 25))
            out_f = fused_g.push(f)
            out_u = unfused_g.push(f)
            assert len(out_f) == len(out_u) == 1
            for pa, pb in zip(out_f[0].planes, out_u[0].planes):
                assert np.array_equal(np.asarray(pa), np.asarray(pb))
            assert out_f[0].pts == i

    def test_stateful_filter_breaks_chain(self):
        g = GraphRunner("negate,fps=25,hflip,vflip", vprops())
        names = [n.name for n in g.graph.nodes]
        # fps is stateful: at most the hflip+vflip pair fuses
        assert any(n.startswith("fused:hflip+vflip") for n in names) or \
            not any("negate" in n and "fps" in n for n in names
                    if n.startswith("fused:"))
