"""Opus (CELT mode) decoder: cross-validation against the reference
decoder on reference-encoded Ogg Opus streams.

Every 20 ms window must match the reference decoder to >= 60 dB SNR
(two independent float implementations of the same integer-exact
entropy layer; the PVQ/allocation/folding decisions are bit-exact, the
residual difference is float summation order). Content includes tones,
noise and a hard transient (exercises short blocks, tf changes,
anticollapse and the folding paths); bitrates span heavy band
skipping (32k) to near-lossless (255k).

Reference: libavcodec/opus/dec.c, dec_celt.c, pvq.c, rc.c.
"""
import os
import shutil
import subprocess
import tempfile
import wave

import numpy as np
import pytest

REF = shutil.which("ffmpeg", path="/root/repo/.refbuild")
if REF is None:
    pytest.skip("reference ffmpeg unavailable", allow_module_level=True)

from librempeg_tpu.codecs.api import find_decoder  # noqa: E402
from librempeg_tpu.formats.api import open_input  # noqa: E402


def _signal():
    sr = 48000
    t = np.arange(sr * 2) / sr
    rng = np.random.default_rng(3)
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.15 * np.sin(2 * np.pi * 2931 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    sig[24000:24480] += (0.5 * rng.standard_normal(480)) \
        .astype(np.float32)
    return np.clip(sig, -0.99, 0.99)


def _roundtrip(ch, bitrate):
    sig = _signal()
    sr = 48000
    with tempfile.TemporaryDirectory() as td:
        wav = os.path.join(td, "t.wav")
        og = os.path.join(td, "t.ogg")
        out = os.path.join(td, "o.f32")
        w = wave.open(wav, "wb")
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        cols = [sig] if ch == 1 else [sig, -0.7 * sig]
        w.writeframes((np.stack(cols, 1).ravel() * 32767)
                      .astype(np.int16).tobytes())
        w.close()
        subprocess.run([REF, "-v", "error", "-y", "-i", wav, "-c:a",
                        "opus", "-strict", "-2", "-b:a", bitrate, og],
                       check=True)
        subprocess.run([REF, "-v", "error", "-y", "-i", og, "-f",
                        "f32le", out], check=True)
        refpcm = np.frombuffer(open(out, "rb").read(), np.float32) \
            .reshape(-1, ch).T
        dmx = open_input(og)
        assert dmx.streams[0].codecpar.codec_id == "opus"
        dec = find_decoder("opus")(dmx.streams[0].codecpar)
        chunks = []
        for pkt in dmx.packets():
            for f in dec.decode(pkt):
                chunks.append(np.asarray(f.data))
        ours = np.concatenate(chunks, axis=1)
        return ours, refpcm


@pytest.mark.parametrize("ch,bitrate", [
    (1, "48k"),                      # mono, heavy band skipping
    (2, "32k"),                      # stereo, intensity + skipping
    (2, "128k"),                     # stereo, full-band
])
def test_celt_decode_matches_reference(ch, bitrate):
    ours, refpcm = _roundtrip(ch, bitrate)
    n = refpcm.shape[1]
    assert abs(ours.shape[1] - n) <= 960, "end trimming"
    F = 960
    worst = 1e9
    for i in range(0, min(n, ours.shape[1]) - F, F):
        b = refpcm[:, i:i + F]
        a = ours[:, i:i + F]
        e = a - b
        s = 10 * np.log10(max(float((b ** 2).sum()), 1e-12)
                          / max(float((e ** 2).sum()), 1e-12))
        worst = min(worst, s)
    assert worst >= 60.0, f"worst 20ms window {worst:.1f} dB"


def test_silk_mode_decodes():
    """SILK configs decode (full coverage in test_opus_silk.py);
    an all-zero payload is a valid inactive frame -> near-silence."""
    from librempeg_tpu.codecs.opus.codec import OpusDecoder
    from librempeg_tpu.core.packet import Packet
    from librempeg_tpu.formats.api import CodecParameters

    dec = OpusDecoder(CodecParameters(codec_type="audio",
                                      codec_id="opus", nb_channels=1,
                                      sample_rate=48000))
    # config 5 (SILK MB 20ms), code 0
    out = dec.decode(Packet(data=bytes([5 << 3]) + b"\x00" * 10,
                            pts=0, dts=0))
    assert len(out) == 1 and out[0].data.shape == (1, 960)
    assert float(np.abs(np.asarray(out[0].data)).max()) < 0.1
