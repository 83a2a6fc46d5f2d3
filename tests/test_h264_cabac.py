"""H.264 CABAC entropy layer: engine + slice syntax validated through
entropy transcoding (CAVLC -> CABAC recode must decode bit-identically
in BOTH our decoder and the reference decoder)."""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from librempeg_tpu.native import build as native

if not native.available():
    pytest.skip("native extension unavailable", allow_module_level=True)

from librempeg_tpu.codecs.h264.codec import H264Decoder, H264Encoder  # noqa: E402
from librempeg_tpu.codecs.h264.entropy_transcode import (  # noqa: E402
    cavlc_to_cabac,
)
from librempeg_tpu.core.frame import VideoFrame  # noqa: E402
from librempeg_tpu.core.packet import Packet  # noqa: E402
from librempeg_tpu.core.rational import Rational  # noqa: E402

from conftest import reference_ffmpeg  # noqa: E402


def _frames(w, h, n, seed=9, noise=4):
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:h * 2, 0:w * 2]
    base = np.clip(128 + 60 * np.sin(gx / 23.0) * np.cos(gy / 17.0)
                   + rng.normal(0, noise, (h * 2, w * 2)), 0,
                   255).astype(np.uint8)
    out = []
    for i in range(n):
        y = base[i:h + i, i * 2:w + i * 2]
        u = base[i // 2:h // 2 + i // 2, i:w // 2 + i]
        v = base[i // 2 + 4:h // 2 + i // 2 + 4, i + 2:w // 2 + i + 2]
        out.append(VideoFrame(planes=(y.copy(), u.copy(), v.copy()),
                              format="yuv420p", width=w, height=h,
                              pts=i, time_base=Rational(1, 25)))
    return out


def _stream(w, h, n, **enc_opts):
    enc = H264Encoder(width=w, height=h, **enc_opts)
    return b"".join(bytes(enc.encode(f)[0].data)
                    for f in _frames(w, h, n))


def _dec(data):
    return H264Decoder(device=0).decode(Packet(data=data, pts=0, dts=0))


@pytest.mark.parametrize("opts", [
    dict(qp=26, g=4, variety=1, pcm=0),  # every CABAC-codable shape
    dict(qp=35, g=8),                # high qp, sparse residuals
    dict(qp=12, g=3),                # low qp, dense residuals + escapes
])
def test_cabac_recode_bit_exact_ours(opts):
    cavlc = _stream(96, 64, 8, **opts)
    cabac = cavlc_to_cabac(cavlc)
    fa, fb = _dec(cavlc), _dec(cabac)
    assert len(fa) == len(fb) == 8
    for a, b in zip(fa, fb):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.skipif(reference_ffmpeg() is None,
                    reason="reference not built")
@pytest.mark.parametrize("opts", [
    dict(qp=26, g=4, variety=1, pcm=0),
    dict(qp=30, g=6),
])
def test_cabac_recode_reference_decodes(opts):
    """The reference decoder must produce bit-identical frames from the
    CAVLC original and our CABAC recode."""
    w, h = 96, 64
    cavlc = _stream(w, h, 8, **opts)
    cabac = cavlc_to_cabac(cavlc)
    with tempfile.TemporaryDirectory() as td:
        p1 = os.path.join(td, "a.264")
        p2 = os.path.join(td, "b.264")
        open(p1, "wb").write(cavlc)
        open(p2, "wb").write(cabac)
        o1 = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", p1,
             "-f", "rawvideo", "-"], capture_output=True,
            check=True).stdout
        o2 = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", p2,
             "-f", "rawvideo", "-"], capture_output=True)
        assert o2.returncode == 0, o2.stderr.decode()[:400]
        assert o1 == o2.stdout
        assert len(o1) == 8 * w * h * 3 // 2


@pytest.mark.skipif(reference_ffmpeg() is None,
                    reason="reference not built")
def test_encoder_cabac_option():
    """H264Encoder(cabac=1) emits CABAC directly; the reference decodes
    it identically to the CAVLC twin."""
    w, h = 96, 64
    frames = _frames(w, h, 6)
    outs = {}
    for cb in (0, 1):
        enc = H264Encoder(width=w, height=h, qp=28, g=3, cabac=cb)
        data = b"".join(bytes(enc.encode(f)[0].data) for f in frames)
        with tempfile.NamedTemporaryFile(suffix=".264",
                                         delete=False) as f:
            f.write(data)
            path = f.name
        outs[cb] = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", path,
             "-f", "rawvideo", "-"], capture_output=True,
            check=True).stdout
        os.unlink(path)
    assert outs[0] == outs[1] and len(outs[0]) == 6 * w * h * 3 // 2


def test_cabac_bsf():
    from librempeg_tpu.codecs.bsf import find_bsf

    cavlc = _stream(80, 48, 4, qp=28, g=2)
    bsf = find_bsf("h264_cavlc2cabac")()
    pkts = [Packet(data=cavlc, pts=0, dts=0)]
    out = b"".join(bytes(p.data) for pkt in pkts
                   for p in bsf.filter(pkt))
    fa, fb = _dec(cavlc), _dec(out)
    for a, b in zip(fa, fb):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_cabac_compression_gain():
    """CABAC should not expand typical streams (sanity on coding
    efficiency)."""
    cavlc = _stream(96, 64, 8, qp=26, g=4)
    cabac = cavlc_to_cabac(cavlc)
    assert len(cabac) < len(cavlc)
