"""H.264 intra codec tests: cross-validated with the reference decoder
(our encoder) and self-consistent (our decoder = bit-exact with both)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))**2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def encode_frames(w, h, n, qp=24):
    enc = find_encoder("h264")(width=w, height=h, qp=qp,
                               framerate=Rational(25, 1))
    pkts = []
    frames = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                       height=h, pts=i, time_base=Rational(1, 25))
        frames.append(f)
        pkts += enc.encode(f)
    return pkts, frames


class TestH264OwnPair:
    def test_roundtrip_matches_source(self):
        pkts, frames = encode_frames(64, 48, 3, qp=20)
        dec = find_decoder("h264")()
        outs = []
        for p in pkts:
            outs += dec.decode(p)
        assert len(outs) == 3
        for o, f in zip(outs, frames):
            assert psnr(o.planes[0], f.planes[0]) > 45
            assert psnr(o.planes[1], f.planes[1]) > 40

    def test_qp_quality_tradeoff(self):
        sizes = {}
        for qp in (18, 30, 40):
            pkts, _ = encode_frames(64, 48, 1, qp=qp)
            sizes[qp] = len(pkts[0].data)
        assert sizes[18] > sizes[30] > sizes[40]


@pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
class TestH264VsReference:
    def _ref_decode(self, pkts, w, h, n):
        data = b"".join(bytes(p.data) for p in pkts)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "h264",
             "-i", "pipe:0", "-f", "rawvideo", "-"],
            input=data, capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[:300]
        fsz = w * h * 3 // 2
        return [np.frombuffer(r.stdout[i * fsz:i * fsz + w * h], np.uint8
                              ).reshape(h, w) for i in range(n)]

    def test_reference_decodes_ours(self):
        w, h = 96, 64
        pkts, frames = encode_frames(w, h, 3, qp=22)
        refs = self._ref_decode(pkts, w, h, 3)
        assert len(refs) == 3
        for r, f in zip(refs, frames):
            p = psnr(r, f.planes[0])
            assert p > 42, f"ref-decode PSNR {p:.1f}"

    def test_our_decoder_bit_exact_with_reference(self):
        w, h = 64, 48
        pkts, _ = encode_frames(w, h, 2, qp=26)
        refs = self._ref_decode(pkts, w, h, 2)
        dec = find_decoder("h264")()
        ours = []
        for p in pkts:
            ours += dec.decode(p)
        for o, r in zip(ours, refs):
            np.testing.assert_array_equal(np.asarray(o.planes[0]), r)
