"""Slim sparse-fetch layout for the MPEG-4 encoder (P frames).

The slim program (encoder._sparsify_slim) ships a structure-aware
compact fetch sized for typical inter content; it must be
bit-identical to the always-correct fat layout, and overflow must fall
back to fat transparently (encoder.encode_finish retry).
"""
import numpy as np
import pytest

from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg

W, H = 512, 512   # nblk = 64*64 + 2*32*32 = 6144 >= 4096 -> slim eligible


def _frames(n, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(W, H, i)
        y = np.roll(y, i * 3, axis=1)
        if noise:
            y = np.clip(y.astype(np.int32)
                        + rng.integers(-int(noise), int(noise) + 1,
                                       y.shape), 0, 255).astype(np.uint8)
        out.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                              width=W, height=H, pts=i,
                              time_base=Rational(1, 25)))
    return out


def _encode(frames, force_fat=False):
    enc = Mpeg4Encoder(width=W, height=H, qscale=6, gop_size=100)
    if force_fat:
        enc._sp_init()
        enc._sp_slim_ok = False
    data = b""
    for f in frames:
        for pkt in enc.encode(f):
            data += pkt.data
    for pkt in enc.flush():
        data += pkt.data
    return enc, data


@pytest.mark.slow
def test_slim_eligible_and_bit_identical_to_fat():
    frames = _frames(3)
    enc_s, data_s = _encode(frames)
    assert enc_s._sp_slim_ok, "512x512 stream should stay on the slim path"
    _, data_f = _encode(frames, force_fat=True)
    assert data_s == data_f


def test_slim_overflow_falls_back_to_fat():
    # heavy noise at a moderate q floods the AC-event cap; the stream
    # must downgrade to fat (hysteresis) and still be bit-identical
    frames = _frames(3, noise=60)
    enc_s, data_s = _encode(frames)
    _, data_f = _encode(frames, force_fat=True)
    assert data_s == data_f
    assert not enc_s._sp_slim_ok, (
        "overflow should downgrade the stream to the fat layout")


@pytest.mark.skipif(reference_ffmpeg() is None, reason="reference not built")
def test_slim_stream_decodes(tmp_path):
    import subprocess
    frames = _frames(3)
    _, data = _encode(frames)
    m4v = tmp_path / "slim.m4v"
    m4v.write_bytes(data)
    out = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-f", "m4v", "-i", str(m4v),
         "-f", "rawvideo", "-"], capture_output=True, check=True)
    fsz = W * H * 3 // 2
    assert len(out.stdout) >= 3 * fsz, out.stderr.decode()
    got = np.frombuffer(out.stdout[:W * H], np.uint8).reshape(H, W)
    ref = np.asarray(frames[0].planes[0])
    mse = np.mean((got.astype(np.float64) - ref) ** 2)
    assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 30
