"""ADPCM family: round-trips + bit-exact cross-validation against the
reference decoder/encoder (when the reference build has adpcm)."""
import functools
import os
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import decoders, encoders
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.core.samplefmt import ChannelLayout
from librempeg_tpu.formats.api import open_input, open_output

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "ffmpeg")


@functools.lru_cache
def ref_has_adpcm():
    if not os.path.exists(REF):
        return False
    out = subprocess.run([REF, "-hide_banner", "-decoders"],
                         capture_output=True, text=True).stdout
    return "adpcm_ima_wav" in out


def sig(ch=2, n=44100):
    t = np.arange(n) / 44100.0
    chans = [np.sin(2 * np.pi * (440 + 210 * c) * t) * (9000 + 2000 * c)
             for c in range(ch)]
    return np.stack(chans).astype(np.int16)


def frame(pcm):
    return AudioFrame(data=pcm, sample_rate=44100, sample_fmt="s16p",
                      layout=ChannelLayout.default(pcm.shape[0]), pts=0,
                      time_base=Rational(1, 44100))


class TestAdpcmRoundtrip:
    @pytest.mark.parametrize("name", ["adpcm_ima_wav", "adpcm_ms"])
    @pytest.mark.parametrize("ch", [1, 2])
    def test_roundtrip_snr(self, name, ch):
        pcm = sig(ch)
        enc = encoders()[name](sample_rate=44100, channels=ch)
        pkts = enc.encode(frame(pcm)) + enc.flush()
        dec = decoders()[name](enc.codec_parameters())
        outs = []
        for p in pkts:
            outs += dec.decode(p)
        y = np.concatenate([np.asarray(o.data) for o in outs],
                           axis=1)[:, :pcm.shape[1]]
        err = np.sqrt(np.mean((y.astype(float) - pcm) ** 2))
        assert 20 * np.log10(9000 / max(err, 1e-9)) > 35

    def test_wav_container_roundtrip(self, tmp_path):
        pcm = sig(2)
        enc = encoders()["adpcm_ima_wav"](sample_rate=44100, channels=2)
        pkts = enc.encode(frame(pcm)) + enc.flush()
        out = tmp_path / "a.wav"
        mux = open_output(str(out))
        mux.add_stream(enc.codec_parameters(), Rational(1, 44100))
        for p in pkts:
            p.stream_index = 0
            mux.write(p)
        mux.close()
        d = open_input(str(out))
        par = d.streams[0].codecpar
        assert par.codec_id == "adpcm_ima_wav"
        dec = decoders()["adpcm_ima_wav"](par)
        outs = []
        for p in d.packets():
            outs += dec.decode(p)
        y = np.concatenate([np.asarray(o.data) for o in outs], axis=1)
        assert y.shape[1] >= pcm.shape[1]


@pytest.mark.skipif(not ref_has_adpcm(),
                    reason="reference build lacks adpcm")
class TestAdpcmCrossValidation:
    def _ref_decode(self, path, tmp_path):
        out = tmp_path / "ref.pcm"
        subprocess.run([REF, "-v", "error", "-i", str(path),
                        "-f", "s16le", str(out), "-y"], check=True)
        raw = np.frombuffer(out.read_bytes(), np.int16)
        return raw

    @pytest.mark.parametrize("name", ["adpcm_ima_wav", "adpcm_ms"])
    def test_reference_decodes_ours_bitexact(self, name, tmp_path):
        """Reference decode of our stream == our decode (same algorithm)."""
        pcm = sig(2)
        enc = encoders()[name](sample_rate=44100, channels=2)
        pkts = enc.encode(frame(pcm)) + enc.flush()
        out = tmp_path / "a.wav"
        mux = open_output(str(out))
        mux.add_stream(enc.codec_parameters(), Rational(1, 44100))
        for p in pkts:
            p.stream_index = 0
            mux.write(p)
        mux.close()
        ref = self._ref_decode(out, tmp_path).reshape(-1, 2).T
        dec = decoders()[name](enc.codec_parameters())
        outs = []
        for p in pkts:
            outs += dec.decode(p)
        ours = np.concatenate([np.asarray(o.data) for o in outs], axis=1)
        n = min(ours.shape[1], ref.shape[1])
        assert np.array_equal(ours[:, :n], ref[:, :n])

    @pytest.mark.parametrize("name,codec", [("adpcm_ima_wav",
                                             "adpcm_ima_wav"),
                                            ("adpcm_ms", "adpcm_ms")])
    def test_we_decode_reference_bitexact(self, name, codec, tmp_path):
        """Our decode of a reference-encoded stream == reference decode."""
        pcm = sig(2)
        raw = tmp_path / "in.pcm"
        raw.write_bytes(pcm.T.reshape(-1).tobytes())
        wav = tmp_path / "r.wav"
        subprocess.run([REF, "-v", "error", "-f", "s16le", "-ar", "44100",
                        "-ac", "2", "-i", str(raw), "-c:a", codec,
                        str(wav), "-y"], check=True)
        ref = self._ref_decode(wav, tmp_path).reshape(-1, 2).T
        d = open_input(str(wav))
        dec = decoders()[name](d.streams[0].codecpar)
        outs = []
        for p in d.packets():
            outs += dec.decode(p)
        ours = np.concatenate([np.asarray(o.data) for o in outs], axis=1)
        n = min(ours.shape[1], ref.shape[1])
        assert n > 40000
        assert np.array_equal(ours[:, :n], ref[:, :n])
