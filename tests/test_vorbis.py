"""Vorbis decoder vs reference-encoded streams (SNR-gated), including
block-switching transients, mono, and multiple rates."""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")


def _encode(src_expr, rate, duration, path, mono=False):
    if mono:
        expr = f"aevalsrc={src_expr}:s={rate}:d={duration}"
    else:
        expr = f"aevalsrc={src_expr}|{src_expr}:s={rate}:d={duration}"
    subprocess.run(
        [reference_ffmpeg(), "-y", "-v", "error", "-f", "lavfi",
         "-i", expr, "-c:a", "vorbis", "-strict", "-2", path],
        check=True, capture_output=True)


def _ref_decode(path, ch):
    out = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-i", path, "-f", "f32le",
         "-"], capture_output=True, check=True).stdout
    return np.frombuffer(out, np.float32).reshape(-1, ch).T


def _our_decode(path):
    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.formats.api import open_input

    dm = open_input(path)
    dec = find_decoder("vorbis")(dm.streams[0].codecpar)
    outs = []
    for pkt in dm.packets():
        for f in dec.decode(pkt):
            outs.append(np.asarray(f.data))
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("expr,rate,mono,min_snr", [
    ("sin(440*2*PI*t)", 44100, False, 40.0),
    ("sin(440*2*PI*t)*0.3+sin(2930*2*PI*t)*0.2", 48000, False, 35.0),
    # transient bursts force long->short block switching
    ("sin(800*2*PI*t)*lt(mod(t\\,0.25)\\,0.03)", 44100, False, 25.0),
    # (the reference vorbis encoder is stereo-only)
    ("sin(440*2*PI*t)*0.5+sin(120*2*PI*t)*0.4", 22050, False, 30.0),
])
def test_vorbis_snr(expr, rate, mono, min_snr, tmp_path):
    path = str(tmp_path / "t.ogg")
    _encode(expr, rate, 1.1, path, mono=mono)
    ch = 1 if mono else 2
    ref = _ref_decode(path, ch)
    ours = _our_decode(path)
    assert ours.shape[0] == ch
    m = min(ours.shape[1], ref.shape[1])
    assert m > rate // 2
    a, b = ours[:, :m], ref[:, :m]
    err = a - b
    snr = 10 * np.log10(np.sum(b * b) / (np.sum(err * err) + 1e-12))
    assert snr > min_snr, f"SNR {snr:.1f} dB"


def test_vorbis_matroska_roundtrip(tmp_path):
    """Reference vorbis-in-mkv -> our mkv demux + vorbis decode."""
    path = str(tmp_path / "t.mka")
    subprocess.run(
        [reference_ffmpeg(), "-y", "-v", "error", "-f", "lavfi", "-i",
         "aevalsrc=sin(500*2*PI*t)|sin(700*2*PI*t):s=44100:d=0.8",
         "-c:a", "vorbis", "-strict", "-2", "-f", "matroska", path],
        check=True, capture_output=True)
    ref = _ref_decode(path, 2)
    ours = _our_decode(path)
    m = min(ours.shape[1], ref.shape[1])
    assert m > 20000
    a, b = ours[:, :m], ref[:, :m]
    snr = 10 * np.log10(np.sum(b * b) / (np.sum((a - b) ** 2) + 1e-12))
    assert snr > 35.0, f"SNR {snr:.1f} dB"
