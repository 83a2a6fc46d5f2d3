"""H.264 P-slice cross-validation: our encoder's streams are decoded by
our decoder and the reference decoder; outputs must be bit-exact.

Covers: P_L0_16x16, P_SKIP, intra-in-P, quarter-pel MC, in-loop
deblocking (IDR + P), chroma QP mapping (qp >= 30), GOP IDR refresh.
Reference: /root/reference/libavcodec/h264dec.c is the oracle.
"""
import os
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.h264.codec import H264Decoder, H264Encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "ffmpeg")
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference ffmpeg not built")


def make_sequence(n, H, W, motion=(3, 2), seed=11, noise=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (H + 16 * n, W + 16 * n), np.uint8)
    frames = []
    for i in range(n):
        y = base[i * motion[0]:i * motion[0] + H,
                 i * motion[1]:i * motion[1] + W].copy()
        if noise:
            y = np.clip(y.astype(np.int32)
                        + rng.integers(-noise, noise + 1, y.shape),
                        0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), (100 + i * 3) % 256, np.uint8)
        v = np.full((H // 2, W // 2), (140 + i * 2) % 256, np.uint8)
        frames.append((y, u, v))
    return frames


def encode(frames, W, H, qp=28, g=12, sr=8):
    enc = H264Encoder(width=W, height=H, qp=qp, g=g, sr=sr)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(VideoFrame(planes=(y, u, v), format="yuv420p",
                                      width=W, height=H, pts=i,
                                      time_base=Rational(1, 25)))
    return pkts


def our_decode(pkts):
    dec = H264Decoder()
    outs = []
    for p in pkts:
        outs += dec.decode(p)
    return [tuple(np.asarray(pl) for pl in f.planes) for f in outs]


def ref_decode(stream, W, H, tmp_path):
    es = tmp_path / "t.264"
    out = tmp_path / "t.yuv"
    es.write_bytes(stream)
    subprocess.run([REF, "-v", "error", "-i", str(es), "-f", "rawvideo",
                    str(out), "-y"], check=True, capture_output=True)
    raw = out.read_bytes()
    fsz = W * H * 3 // 2
    frames = []
    for i in range(len(raw) // fsz):
        f = np.frombuffer(raw[i * fsz:(i + 1) * fsz], np.uint8)
        frames.append((f[:W * H].reshape(H, W),
                       f[W * H:W * H * 5 // 4].reshape(H // 2, W // 2),
                       f[W * H * 5 // 4:].reshape(H // 2, W // 2)))
    return frames


def check_bitexact(pkts, W, H, tmp_path, min_psnr=None, srcs=None):
    stream = b"".join(bytes(p.data) for p in pkts)
    ours = our_decode(pkts)
    refs = ref_decode(stream, W, H, tmp_path)
    assert len(ours) == len(refs) == len(pkts)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for pi in range(3):
            assert np.array_equal(o[pi], r[pi]), \
                f"frame {i} plane {pi}: ours != reference decoder"
    if min_psnr is not None and srcs is not None:
        for i, (o, s) in enumerate(zip(ours, srcs)):
            mse = np.mean((o[0].astype(float) - s[0]) ** 2)
            psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
            assert psnr > min_psnr, f"frame {i}: psnr {psnr:.1f}"


@needs_ref
class TestH264Inter:
    def test_p_gop_translating(self, tmp_path):
        W, H = 96, 64
        frames = make_sequence(5, H, W, motion=(3, 2))
        pkts = encode(frames, W, H, qp=28)
        check_bitexact(pkts, W, H, tmp_path, min_psnr=30, srcs=frames)

    def test_static_scene_skips(self, tmp_path):
        """A static scene should produce P_SKIP runs and stay bit-exact."""
        W, H = 64, 64
        frames = make_sequence(4, H, W, motion=(0, 0))
        pkts = encode(frames, W, H, qp=26)
        assert len(bytes(pkts[2].data)) < len(bytes(pkts[0].data)) // 4
        check_bitexact(pkts, W, H, tmp_path)

    def test_high_qp_chroma_mapping(self, tmp_path):
        """qp >= 30 exercises the chroma QP table (Table 8-15)."""
        W, H = 64, 48
        frames = make_sequence(3, H, W, motion=(2, 5))
        pkts = encode(frames, W, H, qp=38)
        check_bitexact(pkts, W, H, tmp_path)

    def test_low_qp(self, tmp_path):
        W, H = 48, 48
        frames = make_sequence(3, H, W, motion=(1, 1))
        pkts = encode(frames, W, H, qp=12)
        check_bitexact(pkts, W, H, tmp_path)

    def test_scene_change_intra_in_p(self, tmp_path):
        """Content change mid-GOP forces intra MBs inside P slices."""
        W, H = 64, 64
        frames = make_sequence(2, H, W, motion=(2, 2))
        rng = np.random.default_rng(99)
        y2 = rng.integers(0, 256, (H, W), np.uint8)   # unrelated frame
        frames.append((y2, frames[0][1], frames[0][2]))
        pkts = encode(frames, W, H, qp=30)
        check_bitexact(pkts, W, H, tmp_path)

    def test_gop_idr_refresh(self, tmp_path):
        """g=3 over 7 frames: I P P I P P I, dpb reset at each IDR."""
        W, H = 48, 32
        frames = make_sequence(7, H, W, motion=(1, 3))
        pkts = encode(frames, W, H, qp=27, g=3)
        keys = [bool(p.flags & 1) for p in pkts]
        assert keys == [True, False, False, True, False, False, True]
        check_bitexact(pkts, W, H, tmp_path)

    def test_large_motion(self, tmp_path):
        W, H = 96, 96
        frames = make_sequence(3, H, W, motion=(7, 6))
        pkts = encode(frames, W, H, qp=29, sr=12)
        check_bitexact(pkts, W, H, tmp_path)

    def test_noisy_content(self, tmp_path):
        """Noise on top of motion: every MB carries residual."""
        W, H = 64, 48
        frames = make_sequence(3, H, W, motion=(2, 2), noise=8)
        pkts = encode(frames, W, H, qp=24)
        check_bitexact(pkts, W, H, tmp_path)


@needs_ref
class TestH264Torture:
    """variety=1 cycles every partition shape (16x16/16x8/8x16/all four
    sub_mb_types/I16/I4x4) across MBs, covering every inter decode path
    deterministically."""

    def test_variety_partitions(self, tmp_path):
        W, H = 96, 96      # 36 MBs: 4 full cycles of the 9 shapes
        frames = make_sequence(4, H, W, motion=(3, 5), noise=4)
        enc = H264Encoder(width=W, height=H, qp=27, g=12, variety=1)
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            pkts += enc.encode(VideoFrame(planes=(y, u, v),
                                          format="yuv420p", width=W,
                                          height=H, pts=i,
                                          time_base=Rational(1, 25)))
        check_bitexact(pkts, W, H, tmp_path)

    def test_variety_high_qp(self, tmp_path):
        W, H = 80, 64
        frames = make_sequence(3, H, W, motion=(1, 2), noise=10)
        enc = H264Encoder(width=W, height=H, qp=40, g=12, variety=1)
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            pkts += enc.encode(VideoFrame(planes=(y, u, v),
                                          format="yuv420p", width=W,
                                          height=H, pts=i,
                                          time_base=Rational(1, 25)))
        check_bitexact(pkts, W, H, tmp_path)

    def test_variety_exercises_all_kinds(self, tmp_path):
        """Sanity: the stream really contains every mb shape."""
        W, H = 96, 96
        frames = make_sequence(2, H, W, motion=(2, 3), noise=6)
        enc = H264Encoder(width=W, height=H, qp=27, g=12, variety=1)
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            pkts += enc.encode(VideoFrame(planes=(y, u, v),
                                          format="yuv420p", width=W,
                                          height=H, pts=i,
                                          time_base=Rational(1, 25)))
        # decode the P frame's arrays via the native layer and count kinds
        from librempeg_tpu.codecs.h264.parse import (
            NalUnit, parse_pps, parse_slice_header, parse_sps, split_annexb)
        from librempeg_tpu.codecs.h264 import intra as I
        from librempeg_tpu.native import build as native

        sps = parse_sps(NalUnit.parse(
            split_annexb(I.build_sps(W // 16, H // 16))[0]).rbsp)
        pps = parse_pps(NalUnit.parse(split_annexb(I.build_pps())[0]).rbsp)
        nal = NalUnit.parse(split_annexb(bytes(pkts[1].data))[0])
        sh = parse_slice_header(nal.rbsp, sps, pps, nal.type, nal.ref_idc)
        res = native.h264_decode_slice_cavlc(
            nal.rbsp, sh.data_bit_pos, W // 16, H // 16, 0, 0, sh.qp, 1)
        kinds = set(res["kind"].tolist())
        assert {1, 2, 3} <= kinds          # inter, I4x4, I16 all present
        # partition variety: at least one MB with non-uniform mvs
        mvs = res["mv"]
        per_mb_unique = [len(np.unique(mvs[m].reshape(16, 2), axis=0))
                         for m in range(mvs.shape[0])
                         if res["kind"][m] == 1]
        assert max(per_mb_unique) > 1, "no multi-partition MB found"
        check_bitexact(pkts, W, H, tmp_path)
