"""H.264 High-profile decoder conformance vs the reference decoder.

Streams come from the syntax-level generator (codecs/h264/syngen.py):
randomized High-profile features, decoded by BOTH the reference ffmpeg
and our decoder; outputs must match bit-for-bit (FATE's oracle).
"""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.h264.syngen import HighStreamGen

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")

W_MB, H_MB = 6, 4           # 96x64


def ref_decode(stream: bytes, w, h):
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".264")
    try:
        os.write(fd, stream)
        os.close(fd)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "h264",
             "-i", path, "-f", "rawvideo", "-"],
            capture_output=True)
    finally:
        os.unlink(path)
    err = out.stderr.decode()
    fsz = w * h * 3 // 2
    frames = []
    for i in range(len(out.stdout) // fsz):
        buf = out.stdout[i * fsz:(i + 1) * fsz]
        frames.append((
            np.frombuffer(buf[:w * h], np.uint8).reshape(h, w),
            np.frombuffer(buf[w * h:w * h + w * h // 4],
                          np.uint8).reshape(h // 2, w // 2),
            np.frombuffer(buf[w * h + w * h // 4:],
                          np.uint8).reshape(h // 2, w // 2)))
    return frames, err


def our_decode(stream: bytes):
    from librempeg_tpu.codecs.h264.codec import H264Decoder
    from librempeg_tpu.core.packet import Packet

    dec = H264Decoder()
    frames = dec.decode(Packet(data=stream, pts=0))
    frames += dec.flush()
    return [f.planes for f in frames]


def check(gen, n_expected):
    stream = gen.bytes()
    w, h = W_MB * 16, H_MB * 16
    ref, err = ref_decode(stream, w, h)
    assert len(ref) == n_expected, \
        f"reference decoded {len(ref)}/{n_expected}: {err}"
    assert "error" not in err.lower(), err
    got = our_decode(stream)
    assert len(got) == n_expected
    for i, ((ry, ru, rv), (gy, gu, gv)) in enumerate(zip(ref, got)):
        for name, a, b in (("y", ry, gy), ("u", ru, gu), ("v", rv, gv)):
            bad = np.nonzero(np.asarray(b) != a)
            assert bad[0].size == 0, (
                f"frame {i} plane {name}: {bad[0].size} mismatching "
                f"samples, first at {bad[0][0]},{bad[1][0]}: "
                f"ref {a[bad][0]} got {np.asarray(b)[bad][0]}")


class TestIntra8x8:
    def test_i8x8_only(self):
        g = HighStreamGen(W_MB, H_MB, seed=1)
        g.headers()
        g.i_frame(mix=("i8",))
        check(g, 1)

    def test_mixed_intra_kinds(self):
        g = HighStreamGen(W_MB, H_MB, seed=2)
        g.headers()
        g.i_frame(mix=("i4", "i8", "i16"))
        check(g, 1)

    def test_i8x8_all_qps(self):
        for qp in (10, 30, 46):
            g = HighStreamGen(W_MB, H_MB, seed=3 + qp, qp=qp)
            g.headers()
            g.i_frame(mix=("i8", "i4"))
            check(g, 1)


class TestScalingMatrices:
    def test_sps_matrices(self):
        g = HighStreamGen(W_MB, H_MB, seed=4, scaling="sps")
        g.headers()
        g.i_frame()
        g.p_frame()
        check(g, 2)

    def test_pps_matrices(self):
        g = HighStreamGen(W_MB, H_MB, seed=5, scaling="pps")
        g.headers()
        g.i_frame()
        g.p_frame()
        check(g, 2)

    def test_second_chroma_qp_offset(self):
        g = HighStreamGen(W_MB, H_MB, seed=6, cqp_off=3, cqp_off2=-4)
        g.headers()
        g.i_frame()
        g.p_frame()
        check(g, 2)


class TestInter8x8:
    def test_p_frames_with_t8(self):
        g = HighStreamGen(W_MB, H_MB, seed=7)
        g.headers()
        g.i_frame(mix=("i16",))
        for _ in range(3):
            g.p_frame()
        check(g, 4)

    def test_t8_with_matrices(self):
        g = HighStreamGen(W_MB, H_MB, seed=8, scaling="sps", qp=20)
        g.headers()
        g.i_frame(mix=("i8", "i16"))
        for _ in range(2):
            g.p_frame()
        check(g, 3)


class TestWeightedPred:
    def test_explicit_weights(self):
        g = HighStreamGen(W_MB, H_MB, seed=9, weighted=1,
                          transform_8x8=False)
        g.headers()
        g.i_frame(mix=("i16",))
        for _ in range(3):
            g.p_frame(intra_prob=0.05)
        check(g, 4)

    def test_weights_multi_ref(self):
        g = HighStreamGen(W_MB, H_MB, seed=10, weighted=1, num_ref=3,
                          transform_8x8=False)
        g.headers()
        g.i_frame(mix=("i16",))
        for _ in range(5):
            g.p_frame(intra_prob=0.05)
        check(g, 6)


class TestRefManagement:
    def test_ref_list_reorder(self):
        g = HighStreamGen(W_MB, H_MB, seed=11, num_ref=3,
                          transform_8x8=False)
        g.headers()
        g.i_frame(mix=("i16",))
        g.p_frame()
        g.p_frame()
        # reorder: pick the oldest short-term first (abs_diff syntax)
        g.p_frame(reorder=((0, 1), (1, 0)))
        check(g, 4)

    def test_mmco_drop_short_term(self):
        g = HighStreamGen(W_MB, H_MB, seed=12, num_ref=3,
                          transform_8x8=False)
        g.headers()
        g.i_frame(mix=("i16",))
        g.p_frame()
        g.p_frame()
        # MMCO 1: unmark the frame with PicNum = cur - 2
        g.p_frame(mmco=((1, 1),))
        g.p_frame()
        check(g, 5)

    def test_mmco_long_term(self):
        g = HighStreamGen(W_MB, H_MB, seed=13, num_ref=3,
                          transform_8x8=False)
        g.headers()
        g.i_frame(mix=("i16",))
        g.p_frame()
        # MMCO 3: make PicNum cur-1 a long-term ref idx 0 (after
        # setting MaxLongTermFrameIdx via op 4: v1 = idx + 1)
        g.p_frame(mmco=((4, 1), (3, 0, 0)))
        g.p_frame()
        g.p_frame()
        check(g, 5)


class TestCombined:
    def test_everything_at_once(self):
        g = HighStreamGen(W_MB, H_MB, seed=14, scaling="sps",
                          weighted=1, num_ref=2, qp=24,
                          cqp_off=2, cqp_off2=-2)
        g.headers()
        g.i_frame()
        for i in range(4):
            g.p_frame()
        check(g, 5)


class TestCabacHigh:
    """CAVLC High streams recoded to CABAC (entropy transcoder) must
    decode bit-exactly in both the reference and our CABAC layer."""

    def _recode(self, gen):
        from librempeg_tpu.codecs.h264.entropy_transcode import (
            cavlc_to_cabac,
        )

        return cavlc_to_cabac(gen.bytes())

    def _check_stream(self, stream, n_expected):
        w, h = W_MB * 16, H_MB * 16
        ref, err = ref_decode(stream, w, h)
        assert len(ref) == n_expected, \
            f"reference decoded {len(ref)}/{n_expected}: {err}"
        assert "error" not in err.lower(), err
        got = our_decode(stream)
        assert len(got) == n_expected
        for i, (r3, g3) in enumerate(zip(ref, got)):
            for a, b in zip(r3, g3):
                assert np.array_equal(a, np.asarray(b)), f"frame {i}"

    def test_cabac_i8x8(self):
        g = HighStreamGen(W_MB, H_MB, seed=20)
        g.headers()
        g.i_frame(mix=("i8", "i4", "i16"))
        self._check_stream(self._recode(g), 1)

    def test_cabac_inter_t8(self):
        g = HighStreamGen(W_MB, H_MB, seed=21)
        g.headers()
        g.i_frame(mix=("i16",))
        for _ in range(3):
            g.p_frame()
        self._check_stream(self._recode(g), 4)

    def test_cabac_t8_with_matrices(self):
        g = HighStreamGen(W_MB, H_MB, seed=22, scaling="sps", qp=22)
        g.headers()
        g.i_frame()
        for _ in range(2):
            g.p_frame()
        self._check_stream(self._recode(g), 3)


class TestMultiSlice:
    """Slice boundaries bound intra prediction and entropy contexts
    (§6.4.9); decode must stay bit-exact vs the reference."""

    def test_multi_slice_i_frames(self):
        for slices in (2, 3, 4):
            g = HighStreamGen(W_MB, H_MB, seed=30 + slices)
            g.headers()
            g.i_frame(slices=slices)
            check(g, 1)

    def test_multi_slice_ip(self):
        g = HighStreamGen(W_MB, H_MB, seed=60, num_ref=2)
        g.headers()
        g.i_frame(slices=2)
        for i in range(3):
            g.p_frame(slices=2 + (i % 2))
        check(g, 4)

    def test_multi_slice_with_weights_and_matrices(self):
        g = HighStreamGen(W_MB, H_MB, seed=62, scaling="sps",
                          weighted=1, num_ref=2)
        g.headers()
        g.i_frame(slices=3)
        g.p_frame(slices=2)
        g.p_frame(slices=2)
        check(g, 3)
