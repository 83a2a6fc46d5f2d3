"""MPEG-1/2 video encoders vs the reference decoder and encoder.

The reference decoder is the oracle for our streams (it shares the
simple-IDCT numeric contract our recon uses, so its output must be
bit-exact with the encoder's own reference frames); the reference
encoder anchors size parity at equal qscale.  Behavioral reference:
libavcodec/mpeg12enc.c.
"""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")


def _content(w, h, n, seed=1):
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:h * 2, 0:w * 2]
    base = np.clip(128 + 60 * np.sin(gx / 23.0) * np.cos(gy / 17.0)
                   + rng.normal(0, 2, (h * 2, w * 2)), 0,
                   255).astype(np.uint8)
    out = []
    for i in range(n):
        out.append((base[i:h + i, i * 2:w + i * 2].copy(),
                    base[i // 2:h // 2 + i // 2, i:w // 2 + i].copy(),
                    base[i // 2 + 4:h // 2 + i // 2 + 4,
                         i + 2:w // 2 + i + 2].copy()))
    return out


def _encode(name, frames, w, h, **opts):
    from librempeg_tpu.codecs.api import find_encoder
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational

    enc = find_encoder(name)(width=w, height=h, **opts)
    data = b""
    recons = []
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                       height=h, pts=i, time_base=Rational(1, 25))
        ps = enc.encode(f)
        pkts += ps
        for p in ps:
            data += bytes(p.data)
        recons.append(tuple(np.copy(a) for a in enc._ref))
    return data, recons, pkts


def _ref_decode(data, w, h):
    with tempfile.NamedTemporaryFile(suffix=".m1v", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "mpegvideo",
             "-i", path, "-f", "rawvideo", "-"], capture_output=True)
    finally:
        os.unlink(path)
    assert not r.stderr.decode(), r.stderr.decode()
    fsz = w * h * 3 // 2
    frames = []
    for i in range(len(r.stdout) // fsz):
        buf = r.stdout[i * fsz:(i + 1) * fsz]
        frames.append((
            np.frombuffer(buf[:w * h], np.uint8).reshape(h, w),
            np.frombuffer(buf[w * h:w * h * 5 // 4],
                          np.uint8).reshape(h // 2, w // 2),
            np.frombuffer(buf[w * h * 5 // 4:],
                          np.uint8).reshape(h // 2, w // 2)))
    return frames


@pytest.mark.parametrize("name", ["mpeg1video", "mpeg2video"])
def test_reference_decodes_bit_exact(name):
    """The reference decoder reproduces our encoder's reconstruction
    bit-for-bit (shared simple-IDCT contract), at good quality."""
    w, h = 192, 128
    frames = _content(w, h, 6)
    data, recons, _ = _encode(name, frames, w, h, qscale=4, g=6, sr=5)
    ref = _ref_decode(data, w, h)
    assert len(ref) == 6
    for i, rf in enumerate(ref):
        for p, (r, e) in enumerate(zip(rf, recons[i])):
            assert np.array_equal(
                r, e[:r.shape[0], :r.shape[1]]), (i, p)
        err = (rf[0].astype(float) - frames[i][0].astype(float)) ** 2
        psnr = 10 * np.log10(255 ** 2 / max(float(err.mean()), 1e-9))
        assert psnr > 33, (i, psnr)


@pytest.mark.parametrize("name", ["mpeg1video", "mpeg2video"])
def test_own_decoder_bit_exact(name):
    """Our MPEG-1/2 decoder decodes our encoder's stream bit-exactly
    (same reconstruction contract both ways)."""
    from librempeg_tpu.codecs.api import find_decoder

    w, h = 96, 64
    frames = _content(w, h, 5, seed=7)
    _, recons, pkts = _encode(name, frames, w, h, qscale=6, g=5, sr=4)
    dec = find_decoder(name)()
    outs = []
    for p in pkts:
        outs += dec.decode(p)
    outs += dec.flush()
    assert len(outs) == 5
    for i, f in enumerate(outs):
        for p, pl in enumerate(f.planes):
            e = recons[i][p]
            assert np.array_equal(np.asarray(pl),
                                  e[:pl.shape[0], :pl.shape[1]]), (i, p)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["mpeg1video", "mpeg2video"])
def test_qscale_sweep(name):
    w, h = 96, 64
    frames = _content(w, h, 4, seed=3)
    prev_size = None
    for q in (2, 8, 20):
        data, recons, _ = _encode(name, frames, w, h, qscale=q, g=4,
                                  sr=4)
        ref = _ref_decode(data, w, h)
        assert len(ref) == 4
        for i, rf in enumerate(ref):
            assert np.array_equal(rf[0], recons[i][0][:h, :w]), (q, i)
        if prev_size is not None:
            assert len(data) < prev_size     # coarser q -> smaller
        prev_size = len(data)


@pytest.mark.slow
def test_size_parity_vs_reference_encoder():
    """At equal qscale/GOP the stream size should be within 2x of the
    reference encoder's (no rate control, flat quant, so parity is
    coarse but catches gross inefficiency)."""
    w, h = 192, 128
    frames = _content(w, h, 6)
    raw = b""
    for (y, u, v) in frames:
        raw += y.tobytes() + u.tobytes() + v.tobytes()
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        out = os.path.join(td, "ref.m1v")
        open(yuv, "wb").write(raw)
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-y", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", f"{w}x{h}", "-i", yuv,
             "-c:v", "mpeg1video", "-q:v", "4", "-g", "6", "-bf", "0",
             "-f", "mpeg1video", out], check=True)
        ref_size = os.path.getsize(out)
    data, _, _ = _encode("mpeg1video", frames, w, h, qscale=4, g=6,
                         sr=5)
    assert len(data) < 2 * ref_size, (len(data), ref_size)


def test_cli_transcode_mpeg2(tmp_path):
    """CLI: synthetic avi -> mpeg2video raw ES, reference-verified."""
    import subprocess as sp
    import sys

    out = tmp_path / "out.m2v"
    r = sp.run([sys.executable, "-m", "librempeg_tpu.cli.ffmpeg",
                "-y", "-f", "lavfi", "-i",
                "testsrc=size=96x64:duration=0.2",
                "-c:v", "mpeg2video", str(out)],
               capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    chk = sp.run([reference_ffmpeg(), "-v", "error", "-f", "mpegvideo",
                  "-i", str(out), "-f", "null", "-"],
                 capture_output=True, text=True)
    assert chk.returncode == 0 and not chk.stderr, chk.stderr
