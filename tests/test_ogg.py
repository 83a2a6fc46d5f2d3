"""Ogg container (FLAC mapping): bit-exact roundtrip, page CRC."""
import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder
from librempeg_tpu.formats.api import open_input
from librempeg_tpu.formats.ogg import _ogg_crc
from librempeg_tpu.utils import testgen


class TestOgg:
    def _make(self, tmp_path):
        from librempeg_tpu.cli.ffmpeg import main as ffmain

        pcm = testgen.s16(testgen.audio_mix(48000, 4800, 2)).T
        wav = tmp_path / "in.wav"
        import struct as st

        data = np.ascontiguousarray(pcm).tobytes()
        hdr = (b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + st.pack("<IHHIIHH", 16, 1, 2, 48000,
                                   48000 * 4, 4, 16)
               + b"data" + st.pack("<I", len(data)))
        wav.write_bytes(hdr + data)
        ogg = tmp_path / "out.ogg"
        assert ffmain(["-v", "error", "-i", str(wav), "-c:a", "flac",
                       "-y", str(ogg)]) == 0
        return ogg, pcm

    def test_bit_exact_roundtrip(self, tmp_path):
        ogg, pcm = self._make(tmp_path)
        d = open_input(str(ogg))
        par = d.streams[0].codecpar
        assert d.NAME == "ogg"
        assert (par.codec_id, par.sample_rate, par.nb_channels) == \
            ("flac", 48000, 2)
        dec = find_decoder("flac")(par)
        frames = []
        for p in d.packets():
            frames += dec.decode(p)
        got = np.concatenate([np.asarray(f.data) for f in frames], axis=1)
        np.testing.assert_array_equal(got.T, pcm)   # lossless

    def test_page_crc_spec_vector(self):
        # CRC-32/POSIX-style poly 0x04C11DB7, init 0, no reflection:
        # check value for "123456789" is 0x89A1897F
        assert _ogg_crc(b"123456789") == 0x89A1897F

    def test_corrupt_page_rejected(self, tmp_path):
        ogg, _ = self._make(tmp_path)
        raw = bytearray(ogg.read_bytes())
        raw[60] ^= 0xFF               # flip a byte inside the first page
        bad = tmp_path / "bad.ogg"
        bad.write_bytes(bytes(raw))
        from librempeg_tpu.core.errors import InvalidData

        with pytest.raises(InvalidData):
            open_input(str(bad))

    def test_granule_timestamps(self, tmp_path):
        ogg, pcm = self._make(tmp_path)
        d = open_input(str(ogg))
        pkts = list(d.packets())
        assert pkts[0].pts == 0
        assert sum(p.duration for p in pkts) == len(pcm)
