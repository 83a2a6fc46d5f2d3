"""E-AC-3 (Dolby Digital Plus) decoder vs the reference.

Streams come from the reference's native eac3 encoder (independent
stream, 6 blocks, no AHT/SPX); the reference decoder's float output is
the oracle. Behavioral reference: libavcodec/eac3dec.c + ac3dec.c.
"""
import os
import subprocess
import tempfile

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")


def _roundtrip(src_expr, layout_ch, rate=48000, bitrate="192k"):
    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.formats.api import open_input

    with tempfile.TemporaryDirectory() as td:
        mka = os.path.join(td, "a.mka")
        raw = os.path.join(td, "a.f32")
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-y", "-f", "lavfi",
             "-i", src_expr, "-c:a", "eac3", "-b:a", bitrate,
             "-f", "matroska", mka], check=True)
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-y", "-i", mka,
             "-f", "f32le", raw], check=True)
        ref = np.fromfile(raw, np.float32).reshape(-1, layout_ch).T
        d = open_input(mka)
        st = d.streams[0]
        assert st.codecpar.codec_id == "eac3"
        dec = find_decoder("eac3")(st.codecpar)
        chunks = []
        for p in d.packets():
            for f in dec.decode(p):
                chunks.append(np.asarray(f.data))
        ours = np.concatenate(chunks, axis=1)
    assert ours.shape[0] == layout_ch
    n = min(ours.shape[1], ref.shape[1])
    assert n >= rate // 2
    err = ours[:, :n] - ref[:, :n]
    return 10 * np.log10(float((ref[:, :n] ** 2).mean())
                         / max(float((err ** 2).mean()), 1e-30))


def test_eac3_mono():
    snr = _roundtrip(
        "aevalsrc=0.4*sin(440*2*PI*t)+0.1*sin(3000*2*PI*t):s=48000:d=1",
        1, bitrate="96k")
    assert snr > 80, snr


def test_eac3_stereo_tones():
    snr = _roundtrip(
        "aevalsrc=0.4*sin(440*2*PI*t)|0.4*cos(550*2*PI*t)"
        "+0.1*sin(3000*2*PI*t):s=48000:d=1", 2)
    assert snr > 80, snr


@pytest.mark.slow
def test_eac3_stereo_noise():
    """Broadband noise: dense spectra exercise every bap path and the
    stereo implicit-coupling + rematrixing branches."""
    snr = _roundtrip("aevalsrc=0.4*(random(0)-0.5)|0.4*(random(1)-0.5)"
                     ":s=48000:d=1", 2, bitrate="256k")
    assert snr > 40, snr


@pytest.mark.slow
def test_eac3_5_1():
    snr = _roundtrip(
        "aevalsrc=0.4*sin(440*2*PI*t)|0.4*sin(660*2*PI*t)"
        "|0.3*sin(880*2*PI*t)|0.2*sin(110*2*PI*t)"
        "|0.3*sin(1320*2*PI*t)|0.3*sin(1760*2*PI*t)"
        ":c=5.1:s=48000:d=1", 6, bitrate="384k")
    assert snr > 70, snr


@pytest.mark.slow
def test_eac3_44k():
    snr = _roundtrip(
        "aevalsrc=0.4*sin(440*2*PI*t)|0.4*cos(550*2*PI*t):s=44100:d=1",
        2, rate=44100)
    assert snr > 80, snr
