"""End-to-end audio slice (BASELINE config 1): WAV demux -> PCM decode ->
resample 48k->44.1k -> PCM encode -> WAV mux, plus resampler quality
gates (SNR vs ideal, chunking invariance) — the fate-style acceptance
tests for the audio path."""
import io
import os
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.formats.api import open_input_bytes, open_output_bytes
from librempeg_tpu.resample import Resampler, Swr
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def make_wav_bytes(data_s16: np.ndarray, rate: int) -> bytes:
    """Build a WAV via our muxer from [ch, n] int16."""
    from librempeg_tpu.codecs.pcm import _encode_array
    from librempeg_tpu.core.packet import Packet
    from librempeg_tpu.formats.api import CodecParameters

    mux = open_output_bytes("wav")
    ch = data_s16.shape[0]
    mux.add_stream(CodecParameters(
        codec_type="audio", codec_id="pcm_s16le", sample_rate=rate,
        nb_channels=ch, block_align=2 * ch))
    mux.write(Packet(data=_encode_array("pcm_s16le", data_s16), pts=0))
    mux.finish()
    return mux.io.getvalue()


class TestWav:
    def test_wav_roundtrip_bit_exact(self):
        rate = 48000
        pcm = testgen.s16(testgen.audio_mix(rate, 9600))
        wav = make_wav_bytes(pcm, rate)

        d = open_input_bytes(wav)
        assert d.NAME == "wav"
        st = d.streams[0]
        assert st.codecpar.codec_id == "pcm_s16le"
        assert st.codecpar.sample_rate == rate
        assert st.codecpar.nb_channels == 2
        assert st.duration == 9600

        dec = find_decoder("pcm_s16le")(st.codecpar)
        frames = list(dec.frames(d.packets()))
        out = np.concatenate([np.asarray(f.data) for f in frames], axis=1)
        np.testing.assert_array_equal(out, pcm)
        # pts continuity
        pts = [f.pts for f in frames]
        sizes = [f.nb_samples for f in frames]
        assert pts == [int(np.sum(sizes[:i])) for i in range(len(sizes))]

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="reference not built")
    def test_wav_mux_readable_by_reference(self, tmp_path):
        rate = 44100
        pcm = testgen.s16(testgen.audio_mix(rate, 4410))
        wav = make_wav_bytes(pcm, rate)
        p = tmp_path / "ours.wav"
        p.write_bytes(wav)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(p),
             "-f", "s16le", "-"],
            capture_output=True, check=True)
        ref = np.frombuffer(out.stdout, np.int16).reshape(-1, 2).T
        np.testing.assert_array_equal(ref, pcm)

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="reference not built")
    def test_wav_demux_reference_file(self, tmp_path):
        """Demux a WAV written by the reference; bit-compare."""
        rate = 48000
        pcm = testgen.s16(testgen.audio_mix(rate, 4800))
        raw = tmp_path / "in.raw"
        raw.write_bytes(np.ascontiguousarray(pcm.T).tobytes())
        refwav = tmp_path / "ref.wav"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "s16le", "-ar", str(rate),
             "-ch_layout", "stereo", "-i", str(raw), "-c:a", "pcm_s16le",
             "-y", str(refwav)], check=True)
        d = open_input_bytes(refwav.read_bytes())
        dec = find_decoder("pcm_s16le")(d.streams[0].codecpar)
        out = np.concatenate(
            [np.asarray(f.data) for f in dec.frames(d.packets())], axis=1)
        np.testing.assert_array_equal(out, pcm)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = ref - test
    return 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-30))


class TestResampler:
    def test_ratio_and_length(self):
        r = Resampler(48000, 44100, channels=1)
        x = testgen.audio_mix(48000, 48000, channels=1)
        out = r.process(x)
        out = np.concatenate([out, r.flush()], axis=1)
        assert out.shape == (1, 44100)

    def test_sine_preserved(self):
        """A 1 kHz tone survives 48k->44.1k with high SNR (transition band
        artifacts excluded by trimming edges)."""
        rate_in, rate_out = 48000, 44100
        n = 48000
        x = testgen.sine(1000.0, rate_in, n, channels=1)
        r = Resampler(rate_in, rate_out, channels=1)
        y = np.concatenate([r.process(x), r.flush()], axis=1)[0]
        t = np.arange(len(y)) / rate_out
        ideal = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        core = slice(1000, len(y) - 1000)
        assert snr_db(ideal[core], y[core]) > 60.0

    def test_chunked_equals_oneshot(self):
        x = testgen.audio_mix(48000, 20011, channels=2)
        r1 = Resampler(48000, 44100)
        one = np.concatenate([r1.process(x), r1.flush()], axis=1)
        r2 = Resampler(48000, 44100)
        outs = []
        pos = 0
        for sz in [1, 7, 100, 1000, 4096, 9000, 20011 - 1 - 7 - 100 - 1000 - 4096 - 9000]:
            outs.append(r2.process(x[:, pos:pos + sz]))
            pos += sz
        outs.append(r2.flush())
        chunked = np.concatenate(outs, axis=1)
        assert chunked.shape == one.shape
        np.testing.assert_allclose(chunked, one, atol=1e-6)

    def test_upsample(self):
        x = testgen.sine(1000.0, 22050, 22050, channels=1)
        r = Resampler(22050, 48000, channels=1)
        y = np.concatenate([r.process(x), r.flush()], axis=1)[0]
        assert len(y) == 48000
        t = np.arange(len(y)) / 48000
        ideal = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        core = slice(1000, len(y) - 1000)
        assert snr_db(ideal[core], y[core]) > 60.0

    def test_passthrough_identity_rate(self):
        s = Swr(48000, 48000, in_fmt="s16p", out_fmt="s16p")
        x = testgen.s16(testgen.audio_mix(48000, 1000))
        np.testing.assert_array_equal(s.convert(x), x)

    def test_swr_s16_pipeline(self):
        s = Swr(48000, 44100, in_fmt="s16p", out_fmt="s16p")
        x = testgen.s16(testgen.audio_mix(48000, 48000))
        y = s.convert(x, final=True)
        assert y.dtype == np.int16
        assert y.shape == (2, 44100)

    def test_downmix_stereo_to_mono(self):
        s = Swr(48000, 48000, in_layout=2, out_layout=1)
        x = testgen.audio_mix(48000, 100)
        y = s.convert(x)
        want = (x[0] + x[1]) * np.sqrt(0.5) / (2 * np.sqrt(0.5))
        np.testing.assert_allclose(y[0], want, atol=1e-6)


class TestResampleVsReference:
    @pytest.mark.skipif(reference_ffmpeg() is None, reason="reference not built")
    def test_snr_vs_reference_48k_to_44k(self, tmp_path):
        """Our resampler vs the reference aresample output: high SNR
        (the FATE aresample tests are stddev-tolerance gated, not
        bit-exact: tests/fate-run.sh oneoff/stddev modes)."""
        rate = 48000
        pcm = testgen.s16(testgen.audio_mix(rate, rate * 2))
        raw = tmp_path / "in.raw"
        raw.write_bytes(np.ascontiguousarray(pcm.T).tobytes())
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "s16le", "-ar", str(rate),
             "-ch_layout", "stereo", "-i", str(raw),
             "-af", "aresample=44100", "-f", "s16le", "-"],
            capture_output=True, check=True)
        ref = np.frombuffer(out.stdout, np.int16).reshape(-1, 2).T.astype(np.float64)

        s = Swr(rate, 44100, in_fmt="s16p", out_fmt="s16p")
        ours = s.convert(pcm, final=True).astype(np.float64)
        n = min(ref.shape[1], ours.shape[1])
        assert abs(ref.shape[1] - ours.shape[1]) <= 32
        core = slice(256, n - 256)
        s_db = snr_db(ref[:, core], ours[:, core])
        assert s_db > 40.0, f"SNR vs reference too low: {s_db:.1f} dB"
