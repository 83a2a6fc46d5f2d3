"""Opus SILK + hybrid decoding, cross-validated against libopus.

Ground truth is the system libopus (the normative implementation,
driven over ctypes). At the SILK internal rate (8/12/16 kHz a 48 kHz
libopus decoder degenerates to for NB/MB/WB) no resampler is involved
on either side, so the comparison isolates the LP-layer decode: our
float reimplementation must track libopus' fixed-point decoder to the
float-vs-fixed agreement floor (>= 45 dB; the reference's own float
SILK sits at the same level — and was caught decoding occasional pulse
signs differently from libopus, so ffmpeg output is used only as a
secondary, lower-gated check). 48 kHz comparisons are bounded by
resampler character differences (libopus: minimum-phase IIR/FIR; ours:
linear-phase polyphase; reference: FFT), hence median-window gates.

Reference: libavcodec/opus/silk.c, dec.c (reimplemented).
"""
import ctypes
import ctypes.util
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

_LIBOPUS = ctypes.util.find_library("opus")
if _LIBOPUS is None:
    pytest.skip("libopus unavailable", allow_module_level=True)

from librempeg_tpu.codecs.opus.codec import OpusDecoder  # noqa: E402
from librempeg_tpu.core.packet import Packet  # noqa: E402
from librempeg_tpu.formats.api import CodecParameters  # noqa: E402

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _gen(tmp, name, mode, bw, ch, dur, bitrate=32000):
    prefix = os.path.join(tmp, name)
    subprocess.run([sys.executable,
                    os.path.join(TOOLS, "gen_silk_vectors.py"),
                    prefix, mode, bw, str(ch), str(dur), str(bitrate)],
                   check=True, capture_output=True)
    d = open(prefix + ".pkts", "rb").read()
    n, = struct.unpack("<I", d[:4])
    pos = 4
    pkts = []
    for _ in range(n):
        ln, = struct.unpack("<I", d[pos:pos + 4])
        pos += 4
        pkts.append(d[pos:pos + ln])
        pos += ln
    return pkts, prefix


def _libopus_decode(pkts, ch, rate):
    lib = ctypes.CDLL(_LIBOPUS)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int()
    dec = lib.opus_decoder_create(rate, ch, ctypes.byref(err))
    assert err.value == 0
    buf = np.zeros(5760 * 2, np.float32)
    out = []
    for p in pkts:
        m = lib.opus_decode_float(
            ctypes.c_void_p(dec), p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            5760, 0)
        assert m > 0
        out.append(buf[:m * ch].reshape(m, ch).T.copy())
    lib.opus_decoder_destroy(ctypes.c_void_p(dec))
    return np.concatenate(out, axis=1).astype(np.float64)


def _ours_decode(pkts, ch):
    dec = OpusDecoder(CodecParameters(
        codec_type="audio", codec_id="opus", nb_channels=ch,
        sample_rate=48000))
    out = []
    for p in pkts:
        for f in dec.decode(Packet(data=p, pts=0, dts=0)):
            out.append(np.asarray(f.data))
    return np.concatenate(out, axis=1).astype(np.float64)


def _ours_internal(pkts, ch):
    from librempeg_tpu.codecs.opus.codec import parse_packet
    from librempeg_tpu.codecs.opus.rc import RangeDecoder
    from librempeg_tpu.codecs.opus.silk import SilkDecoder

    silk = SilkDecoder(ch)
    out = []
    for p in pkts:
        config, stereo, _, frames = parse_packet(p)
        bw = 2 if config >= 12 else config // 4
        dur = (10, 20, 40, 60)[config & 3] if config < 12 else \
            (10 if config in (12, 14) else 20)
        for fd in frames:
            out.append(silk.decode_superframe(
                RangeDecoder(fd), bw, stereo + 1, dur))
    return np.concatenate(out, axis=1).astype(np.float64)


def _aligned_snr(ours, ref, search=2000):
    best = (1e18, 0)
    a0, r0 = ours[0], ref[0]
    w0, w1 = 2000, min(10000, min(len(a0), len(r0)) - 1)
    for off in range(search):
        if off + w1 > ref.shape[1]:
            break
        e = float(((a0[w0:w1] - r0[off + w0:off + w1]) ** 2).sum())
        if e < best[0]:
            best = (e, off)
    off = best[1]
    m = min(ours.shape[1], ref.shape[1] - off)
    err = ours[:, :m] - ref[:, off:off + m]
    return 10 * np.log10(
        max(float((ref[:, off:off + m] ** 2).sum()), 1e-12)
        / max(float((err ** 2).sum()), 1e-12)), off


def _median_window_snr(ours, ref, lags):
    best = -1e9
    for lag in lags:
        if lag >= 0:
            a_full, b_full = ours, ref[:, lag:]
        else:
            a_full, b_full = ours[:, -lag:], ref
        m = min(a_full.shape[1], b_full.shape[1])
        if m < 5000:
            continue
        a = a_full[:, :m]
        b = b_full[:, :m]
        W = 960
        snrs = []
        for i in range(W, m - W, W):
            e = a[:, i:i + W] - b[:, i:i + W]
            s = 10 * np.log10(
                max(float((b[:, i:i + W] ** 2).sum()), 1e-12)
                / max(float((e ** 2).sum()), 1e-12))
            snrs.append(s)
        best = max(best, float(np.median(snrs)))
    return best


@pytest.mark.parametrize("mode,bw,ch,dur,rate", [
    ("silk", "nb", 1, 20, 8000),
    ("silk", "mb", 1, 20, 12000),
    ("silk", "wb", 1, 20, 16000),
    ("silk", "wb", 2, 20, 16000),          # stereo mid/side unmix
    ("silk", "nb", 1, 10, 8000),           # 2 subframes
    ("silk", "wb", 1, 40, 16000),          # code-0, 2 silk frames
    ("silk", "wb", 2, 60, 16000),          # 3 frames, stereo
])
def test_silk_internal_rate_matches_libopus(tmp_path, mode, bw, ch,
                                            dur, rate):
    pkts, _ = _gen(str(tmp_path), "v", mode, bw, ch, dur)
    ref = _libopus_decode(pkts, ch, rate)
    ours = _ours_internal(pkts, ch)
    snr, off = _aligned_snr(ours, ref, search=50)
    assert snr >= 45.0, f"{snr:.1f} dB at offset {off}"


@pytest.mark.parametrize("bw,ch", [("swb", 1), ("fb", 2)])
def test_hybrid_matches_libopus(tmp_path, bw, ch):
    pkts, _ = _gen(str(tmp_path), "h", "hybrid", bw, ch, 20)
    ref = _libopus_decode(pkts, ch, 48000)
    ours = _ours_decode(pkts, ch)
    assert ours.shape[1] == 960 * len(pkts)   # no OpusHead: no skip
    med = _median_window_snr(ours, ref, range(-16, 48))
    assert med >= 18.0, f"median window {med:.1f} dB"
    # the CELT layer must contribute above the SILK band (8 kHz)
    spec = np.abs(np.fft.rfft(ours[0, 10000:26384]))
    f = np.fft.rfftfreq(16384, 1 / 48000)
    assert spec[f > 9000].sum() > 0.01 * spec.sum()


def test_silk_48k_output(tmp_path):
    """Full decoder path: pre-skip trim, resampler, packet splitting."""
    pkts, _ = _gen(str(tmp_path), "s", "silk", "wb", 1, 20)
    ref = _libopus_decode(pkts, 1, 48000)
    ours = _ours_decode(pkts, 1)
    assert ours.shape[1] == 960 * len(pkts)   # no OpusHead: no skip
    med = _median_window_snr(ours, ref, range(-16, 48))
    assert med >= 18.0, f"median window {med:.1f} dB"


REFBIN = os.path.join(os.path.dirname(__file__), "..", ".refbuild",
                      "ffmpeg")


@pytest.mark.skipif(not os.path.exists(REFBIN),
                    reason="reference ffmpeg not built")
def test_silk_ogg_vs_reference_cli(tmp_path):
    """Ogg Opus SILK stream through both CLIs; gates account for the
    resampler difference (ours polyphase vs ardftsrc) and the
    reference's occasional pulse-sign divergence from libopus."""
    pkts, prefix = _gen(str(tmp_path), "o", "silk", "wb", 1, 20)
    out = subprocess.run(
        [REFBIN, "-v", "error", "-y", "-i", prefix + ".ogg", "-f",
         "f32le", str(tmp_path / "ref.f32")], capture_output=True)
    if out.returncode != 0:
        pytest.skip("reference build lacks SILK resampling support")
    ref = np.fromfile(tmp_path / "ref.f32", np.float32) \
        .astype(np.float64)[None]
    ours = _ours_decode(pkts, 1)
    med = _median_window_snr(ours, ref, range(400, 800))
    assert med >= 25.0, f"median window {med:.1f} dB"
