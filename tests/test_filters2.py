"""Second-wave filter tests + error concealment."""
import numpy as np
import pytest

import jax.numpy as jnp

from librempeg_tpu.filters import GraphRunner
from librempeg_tpu.ops.conceal import conceal_blocks
from librempeg_tpu.utils import testgen
from tests.test_filters import vframe, vprops


class TestMoreFilters:
    def test_gblur_smooths(self):
        g = GraphRunner("gblur=2.0", vprops())
        f = vframe(1)
        out = g.push(f)[0]
        # variance drops under blur
        assert np.var(np.asarray(out.planes[0]).astype(float)) < \
            np.var(np.asarray(f.planes[0]).astype(float))

    def test_boxblur_flat_preserved(self):
        g = GraphRunner("boxblur=2", vprops())
        flat = vframe(0).replace(planes=(
            np.full((48, 64), 77, np.uint8),
            np.full((24, 32), 128, np.uint8),
            np.full((24, 32), 128, np.uint8)))
        out = g.push(flat)[0]
        assert np.all(np.abs(np.asarray(out.planes[0]).astype(int) - 77) <= 1)

    def test_negate_involution(self):
        g = GraphRunner("negate,negate", vprops())
        f = vframe(2)
        out = g.push(f)[0]
        np.testing.assert_array_equal(np.asarray(out.planes[0]), f.planes[0])

    def test_eq_brightness(self):
        g = GraphRunner("eq=brightness=0.2", vprops())
        f = vframe(0)
        out = g.push(f)[0]
        assert np.mean(np.asarray(out.planes[0]).astype(float)) > \
            np.mean(np.asarray(f.planes[0]).astype(float)) + 20

    def test_drawbox(self):
        g = GraphRunner("drawbox=8:8:16:16:white:t=2", vprops())
        out = g.push(vframe(0))[0]
        y = np.asarray(out.planes[0])
        assert y[8, 8] > 200          # border painted
        assert y[16, 16] == vframe(0).planes[0][16, 16]  # interior intact

    def test_lutyuv(self):
        g = GraphRunner("lutyuv=y=255-val", vprops())
        f = vframe(1)
        out = g.push(f)[0]
        np.testing.assert_array_equal(np.asarray(out.planes[0]),
                                      255 - f.planes[0])

    def test_yadif_noop_on_progressive(self):
        g = GraphRunner("yadif", vprops())
        f = vframe(1)
        out = g.push(f)[0]
        np.testing.assert_array_equal(np.asarray(out.planes[0]), f.planes[0])


class TestConcealment:
    def test_conceal_fills_from_neighbors(self):
        y = np.full((1, 64, 64), 100.0, np.float32)
        y[0, 16:32, 16:32] = 255.0  # corrupt region content
        mask = np.zeros((1, 4, 4), bool)
        mask[0, 1, 1] = True
        out = np.asarray(conceal_blocks(jnp.asarray(y), jnp.asarray(mask)))
        assert np.all(np.abs(out[0, 16:32, 16:32] - 100.0) < 2.0)
        np.testing.assert_array_equal(out[0, :16], y[0, :16])

    def test_conceal_all_bad_column(self):
        rng = np.random.default_rng(0)
        y = rng.uniform(0, 255, (1, 64, 64)).astype(np.float32)
        mask = np.zeros((1, 4, 4), bool)
        mask[0, :, 2] = True
        out = np.asarray(conceal_blocks(jnp.asarray(y), jnp.asarray(mask)))
        assert np.all(np.isfinite(out))
        np.testing.assert_array_equal(out[0, :, :32], y[0, :, :32])


class TestMiscFilters:
    def test_split(self):
        from librempeg_tpu.filters.graph import BufferSink, BufferSource, FilterGraph
        from tests.test_filters import vframe, vprops

        g = FilterGraph()
        src = g.add_instance(BufferSource(vprops()))
        sp = g.add("split", "2")
        s1, s2 = BufferSink("video"), BufferSink("video")
        n1, n2 = g.add_instance(s1), g.add_instance(s2)
        g.link(src, 0, sp, 0)
        g.link(sp, 0, n1, 0)
        g.link(sp, 1, n2, 0)
        g.configure()
        src.out_links[0].queue.append(vframe(0))
        g.run()
        assert len(s1.frames) == 1 and len(s2.frames) == 1

    def test_pan_matrix(self):
        from librempeg_tpu.core.frame import AudioFrame
        from librempeg_tpu.filters import GraphRunner
        from tests.test_filters import aprops

        g = GraphRunner("pan=mono|c0=0.5*c0+0.5*c1", aprops(fmt="fltp"))
        x = np.stack([np.ones(100, np.float32) * 0.4,
                      np.ones(100, np.float32) * 0.2])
        out = g.push(AudioFrame(data=x, sample_rate=48000,
                                sample_fmt="fltp", pts=0))
        y = np.asarray(out[0].data)
        assert y.shape[0] == 1
        np.testing.assert_allclose(y[0], 0.3, atol=1e-6)

    def test_apad(self):
        from librempeg_tpu.core.frame import AudioFrame
        from librempeg_tpu.filters import GraphRunner
        from tests.test_filters import aprops

        g = GraphRunner("apad=whole_len=1000", aprops(fmt="fltp"))
        x = np.zeros((2, 600), np.float32)
        outs = g.push(AudioFrame(data=x, sample_rate=48000,
                                 sample_fmt="fltp", pts=0))
        outs += g.finish()
        assert sum(o.nb_samples for o in outs) == 1000

    def test_channelsplit(self):
        from librempeg_tpu.core.frame import AudioFrame
        from librempeg_tpu.filters.graph import BufferSink, BufferSource, FilterGraph
        from tests.test_filters import aprops

        g = FilterGraph()
        src = g.add_instance(BufferSource(aprops(fmt="fltp")))
        cs = g.add("channelsplit")
        s1, s2 = BufferSink("audio"), BufferSink("audio")
        g.link(src, 0, cs, 0)
        g.link(cs, 0, g.add_instance(s1), 0)
        g.link(cs, 1, g.add_instance(s2), 0)
        g.configure()
        x = np.stack([np.full(10, 0.1, np.float32),
                      np.full(10, 0.9, np.float32)])
        src.out_links[0].queue.append(AudioFrame(
            data=x, sample_rate=48000, sample_fmt="fltp", pts=0))
        g.run()
        assert float(np.asarray(s1.frames[0].data).mean()) == pytest.approx(0.1)
        assert float(np.asarray(s2.frames[0].data).mean()) == pytest.approx(0.9)
