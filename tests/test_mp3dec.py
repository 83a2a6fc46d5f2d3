"""MP3 (Layer III) decoder vs the reference decoder (SNR-gated).

Test material: real-world MP3 files present in the image (MPEG-2/2.5
LSF mono). MPEG-1 streams exercise the same huffman/requantize/hybrid
machinery through different table rows; no MPEG-1 encoder exists in
this environment to generate them (the reference has no native MP3
encoder), so those rows ride on the LSF validation.
"""
import os
import subprocess

import numpy as np
import pytest

from conftest import reference_ffmpeg

SAMPLES = [
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
    "house_lo.mp3",
]

pytestmark = pytest.mark.skipif(
    reference_ffmpeg() is None or not os.path.exists(SAMPLES[0]),
    reason="reference or sample not available")


def _decode_ours(path):
    from librempeg_tpu.codecs.api import find_decoder
    from librempeg_tpu.formats.api import open_input

    dm = open_input(path)
    dec = find_decoder("mp3")(dm.streams[0].codecpar)
    outs = []
    for pkt in dm.packets():
        for f in dec.decode(pkt):
            outs.append(np.asarray(f.data)[0])
    return np.concatenate(outs)


def test_mp3_vs_reference_snr():
    path = SAMPLES[0]
    ref = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-i", path, "-f", "f32le",
         "-"], capture_output=True, check=True).stdout
    refpcm = np.frombuffer(ref, np.float32)
    ours = np.concatenate([np.zeros(481, np.float32),
                           _decode_ours(path)])
    m = min(len(ours), len(refpcm))
    assert m > 50000
    a, b = ours[:m], refpcm[:m]
    err = a - b
    snr = 10 * np.log10(np.sum(b * b) / np.sum(err * err))
    assert snr > 25.0, f"SNR {snr:.1f} dB"
    # no silent output
    assert float(np.sqrt(np.mean(a * a))) > 0.05


def test_mp3_cli_transcode():
    """CLI path: mp3 -> wav, non-silent, duration preserved."""
    import tempfile

    from librempeg_tpu.sched.pipeline import (StreamMap, TranscodeSpec,
                                              Transcoder)

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "o.wav")
        Transcoder(TranscodeSpec(
            input_url=SAMPLES[0], output_url=out,
            audio=StreamMap(codec="pcm_s16le"))).run()
        pcm = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", out, "-f", "s16le",
             "-"], capture_output=True, check=True).stdout
        x = np.frombuffer(pcm, np.int16)
        assert len(x) > 50000
        assert float(np.sqrt(np.mean(x.astype(np.float64) ** 2))) > 1000
