"""FLAC codec tests: lossless roundtrip (bit-exact), container, and
(when the reference has flac enabled) cross-validation."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.formats.api import open_input_bytes, open_output_bytes
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def _ref_has_flac():
    p = reference_ffmpeg()
    if p is None:
        return False
    out = subprocess.run([p, "-v", "0", "-decoders"], capture_output=True)
    return b" flac " in out.stdout


class TestFlacRoundtrip:
    def _roundtrip(self, pcm, rate=44100):
        ch = pcm.shape[0]
        enc = find_encoder("flac")(sample_rate=rate, channels=ch)
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=rate, sample_fmt="s16p", pts=0)]))
        dec = find_decoder("flac")(enc.codec_parameters())
        outs = [np.asarray(f.data) for p in pkts for f in dec.decode(p)]
        return np.concatenate(outs, axis=1)

    def test_stereo_bit_exact(self):
        pcm = testgen.s16(testgen.audio_mix(44100, 10000))
        out = self._roundtrip(pcm)
        np.testing.assert_array_equal(out, pcm)

    def test_mono(self):
        pcm = testgen.s16(testgen.audio_mix(44100, 5000, channels=1))
        out = self._roundtrip(pcm)
        np.testing.assert_array_equal(out, pcm)

    def test_silence_and_constant(self):
        pcm = np.zeros((2, 8192), np.int16)
        pcm[1, :] = 1000
        out = self._roundtrip(pcm)
        np.testing.assert_array_equal(out, pcm)

    def test_compression_happens(self):
        pcm = testgen.s16(testgen.audio_mix(44100, 44100) * 0.2)
        enc = find_encoder("flac")(sample_rate=44100, channels=2)
        pkts = list(enc.packets([AudioFrame(
            data=pcm, sample_rate=44100, sample_fmt="s16p", pts=0)]))
        total = sum(len(p.data) for p in pkts)
        assert total < pcm.nbytes * 0.9


class TestFlacContainer:
    def test_mux_demux_roundtrip(self):
        pcm = testgen.s16(testgen.audio_mix(44100, 9000))
        enc = find_encoder("flac")(sample_rate=44100, channels=2)
        mux = open_output_bytes("flac")
        mux.add_stream(enc.codec_parameters())
        for pkt in enc.packets([AudioFrame(
                data=pcm, sample_rate=44100, sample_fmt="s16p", pts=0)]):
            mux.write(pkt)
        mux.finish()
        blob = mux.io.getvalue()
        assert blob.startswith(b"fLaC")

        d = open_input_bytes(blob)
        assert d.NAME == "flac"
        st = d.streams[0]
        assert st.codecpar.sample_rate == 44100
        dec = find_decoder("flac")(st.codecpar)
        outs = [np.asarray(f.data) for f in dec.frames(d.packets())]
        out = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(out, pcm)


@pytest.mark.skipif(not _ref_has_flac(), reason="reference lacks flac")
class TestFlacVsReference:
    def test_reference_decodes_ours(self, tmp_path):
        pcm = testgen.s16(testgen.audio_mix(44100, 13000))
        enc = find_encoder("flac")(sample_rate=44100, channels=2)
        mux = open_output_bytes("flac")
        mux.add_stream(enc.codec_parameters())
        for pkt in enc.packets([AudioFrame(
                data=pcm, sample_rate=44100, sample_fmt="s16p", pts=0)]):
            mux.write(pkt)
        mux.finish()
        f = tmp_path / "ours.flac"
        f.write_bytes(mux.io.getvalue())
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(f),
             "-f", "s16le", "-"], capture_output=True, check=True)
        ref = np.frombuffer(out.stdout, np.int16).reshape(-1, 2).T
        np.testing.assert_array_equal(ref, pcm)

    def test_we_decode_reference(self, tmp_path):
        pcm = testgen.s16(testgen.audio_mix(44100, 13000))
        raw = tmp_path / "in.raw"
        raw.write_bytes(np.ascontiguousarray(pcm.T).tobytes())
        flac = tmp_path / "ref.flac"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "s16le",
             "-ar", "44100", "-ch_layout", "stereo", "-i", str(raw),
             "-y", str(flac)], check=True)
        d = open_input_bytes(flac.read_bytes())
        dec = find_decoder("flac")(d.streams[0].codecpar)
        outs = [np.asarray(f.data) for f in dec.frames(d.packets())]
        out = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(out[:, :pcm.shape[1]], pcm)
