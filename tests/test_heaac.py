"""HE-AAC v1 (SBR) decoder conformance vs the reference decoder.

Streams come from the SBR payload generator (codecs/aac/sbr.py):
our AAC-LC encoder carrying randomized-but-legal SBR fill elements.
Both the reference and our decoder decode them; outputs are gated on
SNR (float pipelines; the QMF/dequant/gain math mirrors the reference
float decoder, observed agreement 90-120 dB).
"""
import subprocess

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")


def _split_adts(data):
    frames = []
    pos = 0
    while pos + 7 <= len(data):
        ln = ((data[pos + 3] & 3) << 11) | (data[pos + 4] << 3) | \
            (data[pos + 5] >> 5)
        frames.append(data[pos:pos + ln])
        pos += ln
    return frames


def check(rate, channels, n_frames, seed, min_snr=60.0):
    from librempeg_tpu.codecs.aac.decoder import AacFrameDecoder
    from librempeg_tpu.codecs.aac.sbr import generate_he_stream

    data = generate_he_stream(rate, channels, n_frames=n_frames,
                              seed=seed)
    import os
    import tempfile
    fd, path = tempfile.mkstemp(suffix=".aac")
    try:
        os.write(fd, data)
        os.close(fd)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "aac", "-i",
             path, "-f", "f32le", "-"], capture_output=True)
    finally:
        os.unlink(path)
    assert not r.stderr, r.stderr.decode()
    dec = AacFrameDecoder()
    ours = np.concatenate(
        [dec.decode_adts(f) for f in _split_adts(data)], axis=1)
    assert ours.shape[1] == n_frames * 2048, "SBR must upsample 2x"
    ref = np.frombuffer(r.stdout, np.float32)
    nch = ref.size // ours.shape[1]
    ref = ref.reshape(-1, nch).T
    for c in range(ours.shape[0]):
        a, b = ref[c], ours[c]
        n = min(a.size, b.size)
        e = a[:n] - b[:n]
        snr = 10 * np.log10(
            (a[:n] ** 2).sum() / max((e ** 2).sum(), 1e-30))
        assert snr > min_snr, f"ch{c}: SNR {snr:.1f} <= {min_snr}"


def test_mono_rates():
    check(16000, 1, 6, 31)
    check(22050, 1, 6, 30)
    check(24000, 1, 6, 40)
    check(32000, 1, 6, 53)


def test_mono_seed_sweep():
    for s in range(41, 46):
        check(24000, 1, 6, s)


def test_stereo():
    check(24000, 2, 6, 50)
    check(22050, 2, 6, 52)


def test_pure_upsampling():
    """FIL+SBR without a header: decoders run the QMF chain only."""
    from librempeg_tpu.codecs.aac.codec import AacEncoder
    from librempeg_tpu.codecs.aac.decoder import AacFrameDecoder

    rng = np.random.default_rng(3)
    rate, nfr = 24000, 6
    t = np.arange(nfr * 1024) / rate
    pcm = (0.3 * np.sin(2 * np.pi * 500 * t)
           + 0.05 * rng.standard_normal(t.size)).astype(
        np.float32)[None]
    enc = AacEncoder(sample_rate=rate, channels=1)
    out = bytearray()
    for i in range(nfr):
        enc.fill_payload = b""          # bs_header_flag=0 only
        out += bytes(enc._encode_frame(
            pcm[:, i * 1024:(i + 1) * 1024]).data)
    import os
    import tempfile
    fd, path = tempfile.mkstemp(suffix=".aac")
    try:
        os.write(fd, bytes(out))
        os.close(fd)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "aac", "-i",
             path, "-f", "f32le", "-"], capture_output=True)
    finally:
        os.unlink(path)
    dec = AacFrameDecoder()
    ours = np.concatenate(
        [dec.decode_adts(f) for f in _split_adts(bytes(out))],
        axis=1)[0]
    ref = np.frombuffer(r.stdout, np.float32)
    nch = ref.size // ours.size
    ref = ref.reshape(-1, nch).T[0]
    n = min(ref.size, ours.size)
    e = ref[:n] - ours[:n]
    snr = 10 * np.log10(
        (ref[:n] ** 2).sum() / max((e ** 2).sum(), 1e-30))
    assert snr > 100, f"upsampling SNR {snr:.1f}"


def test_cli_he_aac(tmp_path):
    """Product CLI decodes HE-AAC at the doubled rate."""
    import wave

    from librempeg_tpu.codecs.aac.sbr import generate_he_stream

    src = tmp_path / "he.aac"
    src.write_bytes(generate_he_stream(24000, 2, n_frames=6, seed=60))
    dst = tmp_path / "he.wav"
    subprocess.run(
        ["python", "-m", "librempeg_tpu.cli.ffmpeg", "-v", "error",
         "-i", str(src), "-y", str(dst)],
        check=True, capture_output=True)
    w = wave.open(str(dst))
    assert w.getframerate() == 48000
    assert w.getnframes() == 6 * 2048
