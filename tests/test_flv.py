"""FLV container cross-validation with the reference."""
import os
import subprocess

import numpy as np
import pytest

from librempeg_tpu.formats.api import open_input

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "ffmpeg")
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference ffmpeg not built")


@needs_ref
class TestFlv:
    def _ref_aac_flv(self, tmp_path):
        pcm = tmp_path / "in.pcm"
        t = np.arange(22050) / 44100.0
        s = (np.sin(2 * np.pi * 500 * t) * 9000).astype(np.int16)
        pcm.write_bytes(np.stack([s, s], 1).tobytes())
        out = tmp_path / "r.flv"
        subprocess.run([REF, "-v", "error", "-f", "s16le", "-ar", "44100",
                        "-ac", "2", "-i", str(pcm), "-c:a", "aac",
                        "-f", "flv", str(out), "-y"], check=True)
        return out

    def test_demux_reference_flv(self, tmp_path):
        path = self._ref_aac_flv(tmp_path)
        d = open_input(str(path))
        par = d.streams[0].codecpar
        assert par.codec_id == "aac"
        assert par.sample_rate == 44100 and par.nb_channels == 2
        pkts = list(d.packets())
        assert len(pkts) >= 18
        # metadata from onMetaData AMF
        assert "duration" in d.metadata

    def test_decode_reference_flv_audio(self, tmp_path):
        from librempeg_tpu.codecs.api import decoders

        path = self._ref_aac_flv(tmp_path)
        d = open_input(str(path))
        dec = decoders()["aac"](d.streams[0].codecpar)
        n = 0
        for p in list(d.packets())[:6]:
            for f in dec.decode(p):
                n += np.asarray(f.data).shape[1]
        assert n >= 5 * 1024

    def test_our_flv_decodes_in_reference(self, tmp_path):
        """Our muxer's h264+aac FLV round-trips through the reference."""
        from librempeg_tpu.sched.pipeline import (StreamMap, Transcoder,
                                                  TranscodeSpec)

        out = tmp_path / "ours.flv"
        spec = TranscodeSpec(
            input_url="testsrc2=size=64x64:duration=0.3",
            input_format="lavfi", output_url=str(out),
            video=StreamMap(codec="h264", codec_opts={"qp": 32}))
        Transcoder(spec).run()
        r = subprocess.run([REF, "-v", "error", "-i", str(out),
                            "-f", "framecrc", "-"], capture_output=True,
                           text=True, check=True)
        assert r.stdout.count("\n0,") >= 7       # frames decoded
