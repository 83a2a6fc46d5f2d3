"""Core runtime tests: rational time, options, expressions, formats, frames."""
import numpy as np
import pytest

from librempeg_tpu.core import (
    NOPTS,
    AudioFrame,
    Packet,
    Rational,
    VideoFrame,
    pixfmt,
    samplefmt,
    stack_video,
    unstack_video,
)
from librempeg_tpu.core.eval_expr import eval_expr
from librempeg_tpu.core.options import (
    Option,
    OptionTable,
    OptionedObject,
    apply_positional,
    parse_opt_string,
)
from librempeg_tpu.core.rational import Rounding, compare_ts, rescale_q, rescale_rnd


class TestRational:
    def test_rescale_exact(self):
        # 1001/30000 -> 1/90000 (mpegts): frame 30 is pts 90090
        assert rescale_q(30, Rational(1001, 30000), Rational(1, 90000)) == 90090

    def test_rescale_rounding_modes(self):
        assert rescale_rnd(1, 1, 2, Rounding.DOWN) == 0
        assert rescale_rnd(1, 1, 2, Rounding.UP) == 1
        assert rescale_rnd(-1, 1, 2, Rounding.DOWN) == -1
        assert rescale_rnd(-1, 1, 2, Rounding.UP) == 0
        assert rescale_rnd(-1, 1, 2, Rounding.ZERO) == 0
        assert rescale_rnd(-1, 1, 2, Rounding.INF) == -1
        assert rescale_rnd(1, 1, 2, Rounding.NEAR_INF) == 1   # tie away from 0
        assert rescale_rnd(-1, 1, 2, Rounding.NEAR_INF) == -1
        assert rescale_rnd(1, 1, 3, Rounding.NEAR_INF) == 0

    def test_pass_minmax(self):
        from librempeg_tpu.core.rational import INT64_MIN

        assert rescale_rnd(INT64_MIN, 3, 7,
                           Rounding.NEAR_INF | Rounding.PASS_MINMAX) == INT64_MIN

    def test_compare_ts(self):
        assert compare_ts(100, Rational(1, 1000), 1, Rational(1, 10)) == 0
        assert compare_ts(99, Rational(1, 1000), 1, Rational(1, 10)) == -1

    def test_arith(self):
        assert Rational(1, 4) + Rational(1, 4) == Rational(1, 2)
        assert Rational(2, 4) == Rational(1, 2)
        assert float(Rational(1, 2)) == 0.5
        assert Rational(3, 6).reduce() == Rational(1, 2)


class TestOptions:
    def make(self):
        class Thing(OptionedObject):
            OPTIONS = OptionTable(
                Option("width", int, 0, alias="w", min=0, max=8192),
                Option("rate", Rational, Rational(30, 1), alias="r"),
                Option("mode", str, "fast", choices=["fast", "slow"]),
                Option("gain", float, 1.0),
                Option("flag", bool, False),
            )

        return Thing

    def test_defaults_and_set(self):
        t = self.make()(width=640)
        assert t.opts["width"] == 640
        t.set_option("w", "1280")
        assert t.opts["width"] == 1280
        t.set_option("rate", "30000/1001")
        assert t.opts["rate"] == Rational(30000, 1001)
        t.set_option("flag", "true")
        assert t.opts["flag"] is True

    def test_si_suffix_and_expr(self):
        t = self.make()()
        t.set_option("width", "2K")
        assert t.opts["width"] == 2048
        t.set_option("width", "2*320")
        assert t.opts["width"] == 640

    def test_range_check(self):
        t = self.make()()
        with pytest.raises(ValueError):
            t.set_option("width", -1)

    def test_choices(self):
        t = self.make()()
        with pytest.raises(ValueError):
            t.set_option("mode", "turbo")

    def test_parse_opt_string(self):
        d = parse_opt_string("w=640:h=480:flags=bicubic")
        assert d == {"w": "640", "h": "480", "flags": "bicubic"}
        d = parse_opt_string(r"text=a\:b:x=1")
        assert d == {"text": "a:b", "x": "1"}

    def test_positional(self):
        d = parse_opt_string("640:480:x=3")
        d = apply_positional(d, ["w", "h"])
        assert d == {"w": "640", "h": "480", "x": "3"}


class TestEval:
    def test_basic(self):
        assert eval_expr("1+2*3") == 7
        assert eval_expr("2^10") == 1024
        assert eval_expr("(1+2)*3") == 9
        assert eval_expr("-4+2") == -2

    def test_funcs(self):
        assert eval_expr("max(3,7)") == 7
        assert eval_expr("if(gt(5,3),10,20)") == 10
        assert eval_expr("clip(15,0,10)") == 10
        assert abs(eval_expr("sin(PI/2)") - 1.0) < 1e-12

    def test_vars(self):
        assert eval_expr("iw/2", {"iw": 1920}) == 960


class TestPixFmt:
    def test_yuv420p_planes(self):
        d = pixfmt.get("yuv420p")
        assert d.nb_planes == 3
        assert d.plane_shape(0, 1080, 1920) == (1080, 1920)
        assert d.plane_shape(1, 1080, 1920) == (540, 960)
        # odd sizes round up (AV_CEIL_RSHIFT)
        assert d.plane_shape(1, 1081, 1921) == (541, 961)

    def test_buffer_size(self):
        assert pixfmt.get("yuv420p").buffer_size(1080, 1920) == 1920 * 1080 * 3 // 2
        assert pixfmt.get("rgb24").buffer_size(16, 16) == 16 * 16 * 3

    def test_rgb_packed(self):
        d = pixfmt.get("rgb24")
        assert d.nb_planes == 1
        assert d.is_rgb


class TestFrames:
    def _vf(self, w=64, h=48):
        d = pixfmt.get("yuv420p")
        planes = tuple(
            np.zeros(d.plane_shape(i, h, w), np.uint8) for i in range(3)
        )
        return VideoFrame(planes=planes, format="yuv420p", width=w, height=h, pts=7)

    def test_validate(self):
        self._vf().validate()
        bad = self._vf().replace(width=100)
        with pytest.raises(ValueError):
            bad.validate()

    def test_pytree(self):
        import jax

        f = self._vf()
        leaves, treedef = jax.tree_util.tree_flatten(f)
        assert len(leaves) == 3
        f2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert f2.pts == 7 and f2.format == "yuv420p"

    def test_stack_unstack(self):
        frames = [self._vf().replace(pts=i) for i in range(4)]
        b = stack_video(frames)
        assert b.planes[0].shape == (4, 48, 64)
        out = unstack_video(b)
        assert [f.pts for f in out] == [0, 1, 2, 3]

    def test_audio_frame(self):
        a = AudioFrame(data=np.zeros((2, 480), np.float32), sample_rate=48000, pts=0)
        assert a.nb_channels == 2 and a.nb_samples == 480
        assert a.time_base == Rational(1, 48000)
        assert a.duration == 480

    def test_packet_rescale(self):
        p = Packet(data=b"x", pts=30, dts=30, duration=1,
                   time_base=Rational(1001, 30000))
        q = p.rescale_ts(Rational(1, 90000))
        assert q.pts == 90090  # 30 * 1001/30000 s = 1.001 s at 90 kHz
        assert q.duration == 3003


class TestSideData:
    def test_typed_roundtrip(self):
        import numpy as np
        from librempeg_tpu.core.frame import VideoFrame
        from librempeg_tpu.core.sidedata import (
            DisplayMatrix,
            ReplayGain,
            Timecode,
            get_side_data,
            set_side_data,
            side_data_types,
        )

        f = VideoFrame(planes=(np.zeros((8, 8), np.uint8),),
                       format="gray", width=8, height=8)
        set_side_data(f, DisplayMatrix(rotation_degrees=90.0))
        set_side_data(f, ReplayGain(track_gain_db=-3.5))
        assert get_side_data(f, DisplayMatrix).rotation_degrees == 90.0
        assert get_side_data(f, ReplayGain).track_gain_db == -3.5
        assert get_side_data(f, Timecode) is None
        assert len(side_data_types()) >= 8
        # survives frame.replace (dict identity is fine for metadata)
        g = f.replace(pts=5)
        assert get_side_data(g, DisplayMatrix).rotation_degrees == 90.0

    def test_timecode_format(self):
        from librempeg_tpu.core.sidedata import Timecode

        tc = Timecode(hours=1, minutes=2, seconds=3, frames=4)
        assert str(tc) == "01:02:03:04"
        assert str(Timecode(frames=2, drop=True)).endswith(";02")

    def test_wrong_type_rejected(self):
        import pytest
        from librempeg_tpu.core.packet import Packet
        from librempeg_tpu.core.sidedata import set_side_data

        with pytest.raises(TypeError):
            set_side_data(Packet(data=b""), object())


class TestHashFacade:
    def test_known_vectors(self):
        from librempeg_tpu.core.hash import (
            Hasher,
            adler32,
            crc16_flac,
            crc32,
            crc32_mpeg2,
            crc8_flac,
        )

        # av_adler32 starts at 0, standard adler at 1: values differ
        import zlib

        assert adler32(b"hello") != zlib.adler32(b"hello")
        assert adler32(b"") == 0
        assert crc32(b"123456789") == 0xCBF43926        # IEEE check value
        assert crc32_mpeg2(b"123456789") == 0x0376E6E7  # CRC-32/MPEG-2
        assert crc8_flac(b"123456789") == 0xF4          # CRC-8 check
        assert crc16_flac(b"123456789") == 0xFEE8       # CRC-16/BUYPASS
        h = Hasher("md5").update(b"abc")
        assert h.hexdigest() == "900150983cd24fb0d6963f7d28e17f72"
        assert Hasher("sha256").update(b"abc").hexdigest().startswith(
            "ba7816bf")

    def test_incremental_matches_oneshot(self):
        from librempeg_tpu.core.hash import Hasher

        for name in Hasher.NAMES:
            a = Hasher(name).update(b"foo").update(b"bar").hexdigest()
            b = Hasher(name).update(b"foobar").hexdigest()
            assert a == b, name
