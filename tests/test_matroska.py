"""Matroska demuxer tests against reference-muxed files."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.formats.api import open_input
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def _ref_has_mkv_mux():
    p = reference_ffmpeg()
    if p is None:
        return False
    out = subprocess.run([p, "-v", "0", "-muxers"], capture_output=True)
    return b"matroska" in out.stdout


@pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
class TestMatroska:
    def _make(self, tmp_path, ext="mkv"):
        y, u, v = testgen.video_yuv420(64, 48, 0)
        raw = tmp_path / "in.yuv"
        raw.write_bytes((y.tobytes() + u.tobytes() + v.tobytes()) * 4)
        mkv = tmp_path / f"ref.{ext}"
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", "64x48", "-i", str(raw),
             "-c:v", "mpeg4", "-q:v", "4", "-y", str(mkv)],
            capture_output=True)
        if r.returncode != 0:
            pytest.skip("reference lacks matroska muxer")
        return mkv

    def test_demux_reference_mkv(self, tmp_path):
        mkv = self._make(tmp_path)
        d = open_input(str(mkv))
        assert d.NAME == "matroska"
        st = d.streams[0]
        assert st.codecpar.codec_id == "mpeg4"
        assert (st.codecpar.width, st.codecpar.height) == (64, 48)
        pkts = list(d.packets())
        assert len(pkts) == 4
        # decode the first packet with our mpeg4 decoder
        from librempeg_tpu.codecs.mpeg4.decoder import Mpeg4BitstreamDecoder

        dec = Mpeg4BitstreamDecoder()
        if st.codecpar.extradata:
            dec.decode_frame(bytes(st.codecpar.extradata))
        out = dec.decode_frame(bytes(pkts[0].data))
        assert out is not None
        y0, _, _ = testgen.video_yuv420(64, 48, 0)
        mse = np.mean((out[0][:48, :64].astype(float) - y0.astype(float))**2)
        assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 30


class TestMatroskaMux:
    def _mux(self, tmp_path, n_frames=8):
        """Encode mpeg4 + interleave pcm audio into our .mkv; return
        (path, video packets, raw s16 interleaved audio bytes)."""
        from librempeg_tpu.codecs.api import find_encoder
        from librempeg_tpu.core.packet import Packet, PktFlags
        from librempeg_tpu.core.rational import Rational
        from librempeg_tpu.formats.api import CodecParameters, open_output

        enc = find_encoder("mpeg4")(width=64, height=48, qscale=4)
        mkv = tmp_path / "own.mkv"
        mux = open_output(str(mkv), format="matroska")
        vst = mux.add_stream(enc.codec_parameters(), time_base=enc.time_base)
        apar = CodecParameters(codec_type="audio", codec_id="pcm_s16le",
                               sample_rate=48000, nb_channels=2,
                               sample_fmt="s16")
        ast = mux.add_stream(apar, time_base=Rational(1, 48000))
        vpkts = []
        for i in range(n_frames):
            vpkts += enc.encode(testgen.video_frame_yuv420(64, 48, i))
        vpkts += enc.flush()
        for p in vpkts:
            p.stream_index = vst.index
            mux.write(p)
        pcm = testgen.s16(testgen.audio_mix(48000, 1920 * n_frames, 2)).T
        for i in range(0, len(pcm), 1920):
            chunk = np.ascontiguousarray(pcm[i:i + 1920])
            mux.write(Packet(
                data=chunk.tobytes(), pts=i, dts=i, duration=len(chunk),
                stream_index=ast.index, flags=PktFlags.KEY,
                time_base=Rational(1, 48000)))
        mux.write_trailer()
        return mkv, vpkts, pcm.tobytes()

    def test_own_roundtrip(self, tmp_path):
        mkv, vpkts, pcm = self._mux(tmp_path)
        d = open_input(str(mkv))
        assert d.NAME == "matroska"
        kinds = sorted(s.codecpar.codec_id for s in d.streams)
        assert kinds == ["mpeg4", "pcm_s16le"]
        got_v, got_a = [], []
        for p in d.packets():
            (got_v if d.streams[p.stream_index].codecpar.codec_type
             == "video" else got_a).append(bytes(p.data))
        assert got_v == [bytes(p.data) for p in vpkts]
        assert b"".join(got_a) == pcm
        # timestamps carried through in ms ticks
        d2 = open_input(str(mkv))
        v_ts = [p.pts for p in d2.packets()
                if d2.streams[p.stream_index].codecpar.codec_type == "video"]
        assert v_ts == [i * 40 for i in range(len(v_ts))]  # 25 fps -> 40 ms

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_reads_our_mkv(self, tmp_path):
        import subprocess as sp
        mkv, vpkts, pcm = self._mux(tmp_path)
        # video: framecrc via mkv must match framecrc of the same
        # elementary stream muxed as raw .m4v (container-independence)
        m4v = tmp_path / "own.m4v"
        m4v.write_bytes(b"".join(bytes(p.data) for p in vpkts))
        crc_mkv = sp.run([reference_ffmpeg(), "-v", "error", "-i", str(mkv),
                          "-map", "0:v", "-f", "framecrc", "-"],
                         capture_output=True, text=True)
        crc_m4v = sp.run([reference_ffmpeg(), "-v", "error", "-f", "m4v",
                          "-framerate", "25", "-i", str(m4v),
                          "-f", "framecrc", "-"],
                         capture_output=True, text=True)
        assert crc_mkv.returncode == 0 and crc_mkv.stderr == ""
        body_mkv = [ln for ln in crc_mkv.stdout.splitlines()
                    if not ln.startswith("#")]
        body_m4v = [ln for ln in crc_m4v.stdout.splitlines()
                    if not ln.startswith("#")]
        assert len(body_mkv) == 8
        assert [ln.split(", ")[-1] for ln in body_mkv] == \
            [ln.split(", ")[-1] for ln in body_m4v]  # same frame CRCs
        # audio: decoding the mkv's pcm track must give back our samples
        out = sp.run([reference_ffmpeg(), "-v", "error", "-i", str(mkv),
                      "-map", "0:a", "-f", "s16le", "-"],
                     capture_output=True)
        assert out.stdout == pcm


class TestMatroskaH264:
    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_h264_track_conformant(self, tmp_path):
        """V_MPEG4/ISO/AVC track carries avcC CodecPrivate with
        length-prefixed blocks; both the reference and our own
        demux+decode read it back."""
        import subprocess
        from librempeg_tpu.cli.ffmpeg import main as ffmain
        from librempeg_tpu.codecs.api import find_decoder

        out = tmp_path / "h.mkv"
        assert ffmain(["-v", "error", "-f", "lavfi",
                       "-i", "testsrc2=size=64x48:duration=0.3",
                       "-c:v", "h264", "-y", str(out)]) == 0
        raw = out.read_bytes()
        i = raw.find(b"V_MPEG4/ISO/AVC")
        assert i > 0
        r = subprocess.run([reference_ffmpeg(), "-v", "error", "-i",
                            str(out), "-f", "framecrc", "-"],
                           capture_output=True, text=True)
        assert r.returncode == 0 and r.stderr == ""
        assert len([ln for ln in r.stdout.splitlines()
                    if not ln.startswith("#")]) == 8
        d = open_input(str(out))
        dec = find_decoder("h264")(d.streams[0].codecpar)
        frames = []
        for p in d.packets():
            frames += dec.decode(p)
        assert len(frames) == 8
