"""AAC-LC encoder tests: ADTS validity + quality via the reference
decoder (fate-aac style SNR gating)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_encoder
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def _ref_has_aac():
    p = reference_ffmpeg()
    if p is None:
        return False
    out = subprocess.run([p, "-v", "0", "-decoders"], capture_output=True)
    return b" aac " in out.stdout


def snr_db(ref, test):
    err = ref - test
    p = (ref ** 2).sum()
    return 10 * np.log10(p / max((err ** 2).sum(), 1e-30))


class TestAacBitstream:
    def test_adts_sync_and_size(self):
        enc = find_encoder("aac")(sample_rate=44100, channels=2)
        pcm = testgen.audio_mix(44100, 4096)
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=44100, sample_fmt="fltp", pts=0)]))
        assert len(pkts) >= 4
        for p in pkts:
            assert p.data[0] == 0xFF and (p.data[1] & 0xF0) == 0xF0
            ln = ((p.data[3] & 3) << 11) | (p.data[4] << 3) | (p.data[5] >> 5)
            assert ln == len(p.data)


@pytest.mark.skipif(not _ref_has_aac(), reason="reference lacks aac decoder")
class TestAacVsReference:
    def _encode_decode(self, tmp_path, pcm, rate=44100, quality=14.0):
        enc = find_encoder("aac")(sample_rate=rate, channels=pcm.shape[0],
                                  aac_quality=quality)
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=rate, sample_fmt="fltp", pts=0)]))
        adts = tmp_path / "ours.aac"
        adts.write_bytes(b"".join(bytes(p.data) for p in pkts))
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "aac", "-i", str(adts),
             "-f", "s16le", "-"], capture_output=True, check=True)
        dec = (np.frombuffer(out.stdout, np.int16).astype(np.float32)
               / 32768.0).reshape(-1, pcm.shape[0]).T
        return dec

    @staticmethod
    def _align(pcm, dec, probe=8000):
        """Estimate codec delay by cross-correlation (it depends on the
        decoder's priming policy), then return aligned views."""
        a = pcm[0, :probe]
        best = (0, -1.0)
        for d in range(0, 4096):
            b = dec[0, d:d + probe]
            if len(b) < probe:
                break
            c = float(np.dot(a, b)) / (np.linalg.norm(a)
                                       * np.linalg.norm(b) + 1e-9)
            if c > best[1]:
                best = (d, c)
        d = best[0]
        n = min(pcm.shape[1], dec.shape[1] - d) - 2048
        return pcm[:, 1024:n], dec[:, d + 1024:d + n]

    def test_sine_roundtrip_snr(self, tmp_path):
        rate = 44100
        pcm = testgen.sine(1000.0, rate, rate, channels=2)
        dec = self._encode_decode(tmp_path, pcm)
        a, b = self._align(pcm, dec)
        s = snr_db(a, b)
        assert s > 20, f"AAC sine SNR {s:.1f} dB"

    def test_music_like_snr(self, tmp_path):
        rate = 48000
        pcm = testgen.audio_mix(rate, rate)
        dec = self._encode_decode(tmp_path, pcm, rate=rate, quality=20.0)
        a, b = self._align(pcm, dec)
        s = snr_db(a, b)
        assert s > 15, f"AAC broadband SNR {s:.1f} dB"

    def test_mono(self, tmp_path):
        pcm = testgen.audio_mix(44100, 22050, channels=1)
        dec = self._encode_decode(tmp_path, pcm)
        assert dec.shape[0] == 1
        assert dec.shape[1] >= 22050


class TestAacOwnDecoder:
    """Our encoder -> our decoder roundtrip (self-consistency)."""

    def test_roundtrip_snr(self):
        from librempeg_tpu.codecs.aac.decoder import AacFrameDecoder

        rate = 44100
        pcm = testgen.audio_mix(rate, rate // 2)
        enc = find_encoder("aac")(sample_rate=rate, channels=2,
                                  aac_quality=25.0)
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=rate, sample_fmt="fltp", pts=0)]))
        dec = AacFrameDecoder()
        outs = [dec.decode_adts(bytes(p.data)) for p in pkts]
        out = np.concatenate(outs, axis=1)
        # encoder delay: output frame k covers input (k-1)*1024..k*1024
        a = pcm[:, 1024:out.shape[1] - 1024]
        b = out[:, 2048:a.shape[1] + 2048]
        n = min(a.shape[1], b.shape[1])
        s = snr_db(a[:, :n], b[:, :n])
        assert s > 15, f"own-decoder SNR {s:.1f} dB"

    def test_mono_roundtrip(self):
        from librempeg_tpu.codecs.aac.decoder import AacFrameDecoder

        pcm = testgen.sine(500.0, 44100, 8192, channels=1)
        enc = find_encoder("aac")(sample_rate=44100, channels=1)
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=44100, sample_fmt="fltp", pts=0)]))
        dec = AacFrameDecoder()
        outs = [dec.decode_adts(bytes(p.data)) for p in pkts]
        out = np.concatenate(outs, axis=1)
        assert out.shape[0] == 1
        assert np.max(np.abs(out)) > 0.2  # real signal came through


class TestReferenceStreams:
    """Decode streams produced by the reference's own AAC encoder:
    exercises ADTS demux, EIGHT_SHORT windows with grouping, KBD/sine
    shape transitions, LONG_START/STOP, PNS and intensity stereo."""

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_decode_reference_encoded_aac(self, tmp_path):
        import subprocess

        pcm = testgen.s16(testgen.sine(440, 44100, 44100, 2)).T
        raw = tmp_path / "in.pcm"
        raw.write_bytes(np.ascontiguousarray(pcm).tobytes())
        adts = tmp_path / "ref.aac"
        subprocess.run([reference_ffmpeg(), "-v", "error", "-f", "s16le",
                        "-ar", "44100", "-ac", "2", "-i", str(raw),
                        "-c:a", "aac", "-b:a", "128k", "-y", str(adts)],
                       check=True)
        from librempeg_tpu.codecs.api import find_decoder
        from librempeg_tpu.formats.api import open_input

        d = open_input(str(adts))
        assert d.NAME == "aac"
        par = d.streams[0].codecpar
        assert (par.sample_rate, par.nb_channels) == (44100, 2)
        dec = find_decoder("aac")(par)
        chunks = [np.asarray(dec.decode(p)[0].data)
                  for p in d.packets()]      # EVERY frame must decode
        got = np.concatenate(chunks, axis=1)
        r = subprocess.run([reference_ffmpeg(), "-v", "error", "-i",
                            str(adts), "-f", "s16le", "-"],
                           capture_output=True)
        ref = np.frombuffer(r.stdout, np.int16).reshape(-1, 2).T \
            .astype(np.float32) / 32768.0
        n = min(got.shape[1], ref.shape[1])
        err = got[:, :n] - ref[:, :n]
        sig = float(np.mean(ref[:, :n] ** 2))
        snr = 10 * np.log10(sig / max(float(np.mean(err ** 2)), 1e-12))
        # full stream incl. short-window transients; residual is PNS
        # noise (random by construction, uncorrelated with the
        # reference's noise generator)
        assert snr > 40, snr   # ~63 dB measured

    def test_adts_demux_roundtrip_own_encoder(self, tmp_path):
        from librempeg_tpu.cli.ffmpeg import main as ffmain
        from librempeg_tpu.formats.api import open_input

        out = tmp_path / "own.adts"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "sine=frequency=440:duration=0.3",
                       "-c:a", "aac", "-y", str(out)]) == 0
        d = open_input(str(out))
        assert d.NAME == "aac"
        n = len(list(d.packets()))
        assert n >= 12                   # ~0.3 s at 1024/44100


class TestAacPsyQuality:
    """Psy-model encoder quality vs the reference encoder at equal
    bitrate (the aacpsy.c + twoloop acceptance: competitive rate/
    distortion, not just decodability)."""

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_128k_within_reference(self, tmp_path):
        import subprocess

        from librempeg_tpu.codecs.aac.codec import AacEncoder
        from librempeg_tpu.core.frame import AudioFrame
        from librempeg_tpu.core.rational import Rational
        from librempeg_tpu.core.samplefmt import ChannelLayout

        rate, br = 44100, 128000
        pcm = testgen.audio_mix(rate, rate * 2)
        raw = tmp_path / "in.f32"
        raw.write_bytes(pcm.T.astype(np.float32).ravel().tobytes())
        ref_aac = tmp_path / "ref.aac"
        subprocess.run(
            [reference_ffmpeg(), "-y", "-v", "error", "-f", "f32le",
             "-ar", str(rate), "-ch_layout", "stereo", "-i", str(raw),
             "-c:a", "aac", "-b:a", str(br), str(ref_aac)],
            check=True, capture_output=True)

        enc = AacEncoder(sample_rate=rate, channels=2, bit_rate=br)
        fr = AudioFrame(data=pcm.astype(np.float32), sample_rate=rate,
                        sample_fmt="fltp",
                        layout=ChannelLayout.default(2), pts=0,
                        time_base=Rational(1, rate))
        pkts = enc.encode(fr) + enc.flush()
        our_aac = tmp_path / "ours.aac"
        our_aac.write_bytes(b"".join(bytes(p.data) for p in pkts))

        def dec(p):
            o = subprocess.run(
                [reference_ffmpeg(), "-v", "error", "-i", str(p),
                 "-f", "f32le", "-"], capture_output=True,
                check=True).stdout
            return np.frombuffer(o, np.float32).reshape(-1, 2).T

        def best_snr(orig, d):
            m = min(orig.shape[1], d.shape[1])
            best = (0, -1.0)
            for lag in range(0, 4200, 4):
                a = orig[:, :m - lag]
                b = d[:, lag:lag + m - lag]
                c = float((a * b).sum()) / (
                    np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
                if c > best[1]:
                    best = (lag, c)
            lag = best[0]
            a = orig[:, :m - lag]
            b = d[:, lag:lag + m - lag]
            return 10 * np.log10(float((a * a).sum())
                                 / float(((a - b) ** 2).sum()))

        s_ref = best_snr(pcm, dec(ref_aac))
        s_ours = best_snr(pcm, dec(our_aac))
        # size parity (rate control works) and quality within 4 dB
        assert abs(our_aac.stat().st_size - ref_aac.stat().st_size) \
            < 0.15 * ref_aac.stat().st_size
        assert s_ours > s_ref - 4.0, \
            f"ours {s_ours:.1f} dB vs ref {s_ref:.1f} dB"
