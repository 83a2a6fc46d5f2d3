"""MPEG-4 single-pass rate control: output lands on the requested
bitrate (-b:v semantics; reference ratecontrol.c role)."""
import numpy as np
import pytest

from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder, RateController
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational


def encode_seq(target, n=60, W=160, H=128, seed=0):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    enc = Mpeg4Encoder(width=W, height=H, framerate=Rational(25, 1),
                       bit_rate=target, gop_size=12)
    total = 0
    for i in range(n):
        base = (xx + yy + i * 5) // 6 % 230
        y = np.clip(base + rng.integers(-25, 26, (H, W)), 0,
                    255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100 + i % 9, np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        for p in enc.encode(VideoFrame(planes=(y, u, v), format="yuv420p",
                                       width=W, height=H, pts=i,
                                       time_base=Rational(1, 25))):
            total += len(bytes(p.data)) * 8
    return total / (n / 25)


class TestMpeg4RateControl:
    @pytest.mark.parametrize("target", [400_000, 1_200_000])
    def test_hits_target_bitrate(self, target):
        got = encode_seq(target)
        assert abs(got - target) / target < 0.06, \
            f"target {target}, got {got:.0f}"

    def test_controller_converges_from_cold_start(self):
        rc = RateController(1_000_000, Rational(25, 1), 12)
        # synthetic complexity: bits = C / q
        C = 40_000 * 6
        for i in range(100):
            q = rc.pick_qscale(is_i=(i % 12 == 0))
            bits = (3.0 if i % 12 == 0 else 1.0) * C / q
            rc.update(bits, is_i=(i % 12 == 0))
        # buffer bounded: not accumulating unbounded error
        assert abs(rc.buffer) < 1_000_000 / 25 * 12

    def test_fixed_qscale_without_bitrate(self):
        enc = Mpeg4Encoder(width=64, height=64,
                           framerate=Rational(25, 1), qscale=7)
        y = np.zeros((64, 64), np.uint8)
        u = v = np.zeros((32, 32), np.uint8)
        enc.encode(VideoFrame(planes=(y, u, v), format="yuv420p",
                              width=64, height=64, pts=0,
                              time_base=Rational(1, 25)))
        assert enc._rc is None
