"""H.264 B-slice cross-validation: streams with non-reference B frames
(B_L0/B_L1/B_Bi 16x16 + intra-in-B) must decode bit-exact through both
our decoder and the reference decoder, in display (POC) order.

Covers: encoder GOP reordering (pts/dts), decoder POC computation and
output reordering, two reference lists, bi-prediction averaging, B
deblocking bS with two motion vectors (§8.7.2.1), CAVLC and CABAC
entropy, GOP-closing P chains, encoder/decoder flush.
Reference oracle: /root/reference/libavcodec/h264dec.c (h264_slice.c
ref list init, h264_cabac.c B syntax).
"""
import numpy as np
import pytest

from librempeg_tpu.codecs.h264.codec import H264Decoder, H264Encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational

from test_h264_inter import make_sequence, needs_ref, ref_decode

W, H = 64, 48


def encode_b(frames, W, H, **opts):
    enc = H264Encoder(width=W, height=H, **opts)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        pkts += enc.encode(VideoFrame(planes=(y, u, v),
                                      format="yuv420p", width=W,
                                      height=H, pts=i,
                                      time_base=Rational(1, 25)))
    pkts += enc.flush()
    return pkts


def our_decode_display(pkts):
    dec = H264Decoder()
    outs = []
    for p in pkts:
        outs += dec.decode(p)
    outs += dec.flush()
    return outs


def check_bitexact(pkts, n_frames, tmp_path):
    stream = b"".join(bytes(p.data) for p in pkts)
    outs = our_decode_display(pkts)
    assert len(outs) == n_frames
    # display order == increasing pts after reordering
    assert [f.pts for f in outs] == sorted(f.pts for f in outs)
    refs = ref_decode(stream, W, H, tmp_path)
    assert len(refs) == n_frames
    for i, (f, r) in enumerate(zip(outs, refs)):
        for pi, (pa, pb) in enumerate(zip(f.planes, r)):
            assert np.array_equal(np.asarray(pa), pb), \
                f"frame {i} plane {pi} mismatch"


def test_packet_timing():
    frames = make_sequence(6, H, W, noise=4)
    pkts = encode_b(frames, W, H, qp=28, bf=1, g=12)
    # coding order I0 P2 B1 P4 B3 P5(flush): dts monotonic, dts <= pts
    dts = [p.dts for p in pkts]
    assert dts == sorted(dts)
    assert all(p.dts <= p.pts for p in pkts)
    assert sorted(p.pts for p in pkts) == list(range(6))


@needs_ref
def test_b_frames_cavlc(tmp_path):
    frames = make_sequence(9, H, W, noise=6)
    pkts = encode_b(frames, W, H, qp=28, bf=1, g=12)
    check_bitexact(pkts, 9, tmp_path)


@needs_ref
def test_b_frames_cabac(tmp_path):
    frames = make_sequence(9, H, W, noise=6)
    pkts = encode_b(frames, W, H, qp=28, bf=1, g=12, cabac=1)
    check_bitexact(pkts, 9, tmp_path)


@needs_ref
def test_b_frames_gop_boundary(tmp_path):
    """g=4 forces pending-B flush into a GOP-closing P chain at every
    IDR, plus trailing-frame flush at EOF."""
    frames = make_sequence(11, H, W, noise=5, seed=7)
    pkts = encode_b(frames, W, H, qp=30, bf=1, g=4)
    assert sum(1 for p in pkts if p.flags) == 3       # IDRs at 0,4,8
    check_bitexact(pkts, 11, tmp_path)


@needs_ref
def test_b_frames_bf2(tmp_path):
    """Two consecutive B frames share the same ref pair."""
    frames = make_sequence(10, H, W, noise=5, seed=3)
    pkts = encode_b(frames, W, H, qp=26, bf=2, g=12)
    check_bitexact(pkts, 10, tmp_path)


@needs_ref
def test_b_frames_high_qp_scene_change(tmp_path):
    """High qp (chroma QP table region) + a hard scene change that
    drives intra-in-B fallback."""
    fr = make_sequence(8, H, W, noise=8, seed=5)
    rng = np.random.default_rng(99)
    scene = (rng.integers(0, 256, (H, W), np.uint8),
             np.full((H // 2, W // 2), 90, np.uint8),
             np.full((H // 2, W // 2), 160, np.uint8))
    frames = fr[:4] + [scene] + fr[5:]
    pkts = encode_b(frames, W, H, qp=38, bf=1, g=12)
    check_bitexact(pkts, 8, tmp_path)
