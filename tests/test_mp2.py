"""MP2 (layer II) decoder vs the reference decoder (SNR-gated; float
implementation differences documented in codecs/mpegaudio.py)."""
import os
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import decoders
from librempeg_tpu.formats.api import open_input

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "ffmpeg")
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference ffmpeg not built")


def make_mp2_mkv(tmp_path, ch=2, rate=44100, bitrate="192k"):
    pcm = tmp_path / "in.pcm"
    t = np.arange(rate) / rate
    chans = [np.sin(2 * np.pi * (350 + 200 * c) * t) * 0.4
             for c in range(ch)]
    pcm.write_bytes((np.stack(chans, 1).reshape(-1) * 32767)
                    .astype(np.int16).tobytes())
    out = tmp_path / "t.mkv"
    subprocess.run([REF, "-v", "error", "-f", "s16le", "-ar", str(rate),
                    "-ac", str(ch), "-i", str(pcm), "-c:a", "mp2",
                    "-b:a", bitrate, str(out), "-y"], check=True)
    return out


def check(tmp_path, ch, rate, bitrate, min_snr=25.0):
    path = make_mp2_mkv(tmp_path, ch, rate, bitrate)
    d = open_input(str(path))
    dec = decoders()["mp2"](d.streams[0].codecpar)
    outs = []
    for p in d.packets():
        outs += dec.decode(p)
    ours = np.concatenate([np.asarray(f.data) for f in outs], axis=1)
    refp = tmp_path / "ref.s16"
    subprocess.run([REF, "-v", "error", "-i", str(path), "-f", "s16le",
                    str(refp), "-y"], check=True)
    ref = np.frombuffer(refp.read_bytes(), np.int16).reshape(-1, ch).T \
        .astype(np.float32) / 32768.0
    n = min(ours.shape[1], ref.shape[1])
    assert n > rate // 2
    for c in range(ch):
        err = ours[c, :n] - ref[c, :n]
        snr = 10 * np.log10(float((ref[c, :n] ** 2).mean())
                            / max(float((err ** 2).mean()), 1e-12))
        assert snr > min_snr, f"ch {c}: {snr:.1f} dB"


@needs_ref
class TestMp2Decoder:
    def test_stereo_192k(self, tmp_path):
        check(tmp_path, 2, 44100, "192k")

    def test_stereo_48k_table0(self, tmp_path):
        check(tmp_path, 2, 48000, "128k")

    def test_mono_lowrate(self, tmp_path):
        check(tmp_path, 1, 32000, "48k")


@needs_ref
class TestCliAudioNotSilent:
    """Regression: the CLI decode->pcm_s16le path must carry real
    samples (float->int conversion in the PCM encoder used to truncate
    every float-decoder output to silence)."""

    def test_transcode_produces_audio(self, tmp_path):
        import wave

        from librempeg_tpu.sched.pipeline import (StreamMap, Transcoder,
                                                  TranscodeSpec)

        path = make_mp2_mkv(tmp_path)
        out = tmp_path / "o.wav"
        Transcoder(TranscodeSpec(
            input_url=str(path), output_url=str(out),
            audio=StreamMap(codec="pcm_s16le"))).run()
        w = wave.open(str(out))
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        rms = float(np.sqrt((pcm.astype(float) ** 2).mean()))
        assert rms > 1000.0, f"silent output (rms={rms})"


@needs_ref
def test_mp2_in_mpegts_multiframe_packets(tmp_path):
    """mpegts tags layer II as the mp3 codec id and PES payloads carry
    several (possibly split) frames; the decoder must resync, iterate
    and dispatch layers per frame (mpegaudiodec decode.c semantics)."""
    pcm = tmp_path / "in.pcm"
    rate = 48000
    t = np.arange(rate * 2) / rate
    pcm.write_bytes((np.sin(2 * np.pi * 440 * t) * 0.4 * 32767)
                    .astype(np.int16).tobytes())
    ts = tmp_path / "t.ts"
    subprocess.run([REF, "-v", "error", "-f", "s16le", "-ar", str(rate),
                    "-ac", "1", "-i", str(pcm), "-c:a", "mp2", "-b:a",
                    "192k", "-f", "mpegts", str(ts), "-y"], check=True)
    d = open_input(str(ts))
    cp = d.streams[0].codecpar
    dec = decoders()[cp.codec_id](cp)
    outs = []
    for p in d.packets():
        outs += dec.decode(p)
    ours = np.concatenate([np.asarray(f.data) for f in outs], axis=1)
    # nearly all samples must come out (not one frame per PES packet)
    assert ours.shape[1] > rate * 2 - 2 * 1152
    refp = tmp_path / "ref.f32"
    subprocess.run([REF, "-v", "error", "-i", str(ts), "-f", "f32le",
                    str(refp), "-y"], check=True)
    ref = np.frombuffer(refp.read_bytes(), np.float32)
    # align for the reference's decoder delay then gate on SNR
    best = min(range(1000), key=lambda o: float(
        ((ours[0, :4000] - ref[o:o + 4000]) ** 2).sum()))
    n = min(ours.shape[1], len(ref) - best)
    err = ours[0, :n] - ref[best:best + n]
    snr = 10 * np.log10(float((ref[best:best + n] ** 2).mean())
                        / max(float((err ** 2).mean()), 1e-12))
    assert snr > 25.0, f"{snr:.1f} dB"
    # pts continuity in the container time base (90 kHz): one frame is
    # 1152 samples -> 2160 ticks (the first frame is short by the
    # initial codec-delay trim, so its delta is smaller)
    pts = [f.pts for f in outs]
    d_pts = np.diff(pts)
    assert (d_pts[1:] == 2160).all(), d_pts[:8]
    assert 0 < d_pts[0] <= 2160
