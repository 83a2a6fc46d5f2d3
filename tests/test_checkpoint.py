"""Checkpoint/resume tests: an interrupted transcode resumed from a
snapshot produces the same samples as an uninterrupted run."""
import numpy as np
import pytest

from librempeg_tpu.core.errors import EndOfStream
from librempeg_tpu.sched import checkpoint
from librempeg_tpu.sched.pipeline import StreamMap, Transcoder, TranscodeSpec
from librempeg_tpu.utils import testgen

from tests.test_cli import make_wav


def _run_collect(tc, limit=None):
    """Drive the transcoder manually, collecting muxed payloads."""
    out = []
    n = 0
    for pkt in tc.demux.packets():
        chain = tc.chains.get(pkt.stream_index)
        if chain is None:
            continue
        before = len(tc.mux._samples) if hasattr(tc.mux, "_samples") else 0
        chain.send_packet(pkt, tc.mux)
        n += 1
        if limit and n >= limit:
            return out, False
    for chain in tc.chains.values():
        chain.finish(tc.mux)
    return out, True


class TestCheckpoint:
    def _spec(self, path, out):
        return TranscodeSpec(
            input_url=str(path), output_url=str(out),
            audio=StreamMap(codec="pcm_s16le", sample_rate=44100))

    def test_resume_equals_uninterrupted(self, tmp_path):
        make_wav(tmp_path / "in.wav", n=48000)

        # uninterrupted
        spec1 = self._spec(tmp_path / "in.wav", tmp_path / "a.wav")
        Transcoder(spec1).run()
        ref = (tmp_path / "a.wav").read_bytes()

        # interrupted after 5 packets + snapshot + resume
        spec2 = self._spec(tmp_path / "in.wav", tmp_path / "b1.wav")
        tc = Transcoder(spec2)
        n = 0
        for pkt in tc.demux.packets():
            tc.chains[pkt.stream_index].send_packet(pkt, tc.mux)
            n += 1
            if n == 5:
                break
        blob = checkpoint.snapshot(tc)

        spec3 = self._spec(tmp_path / "in.wav", tmp_path / "b2.wav")
        tc2 = Transcoder(spec3)
        checkpoint.restore(tc2, blob)
        for pkt in tc2.demux.packets():
            tc2.chains[pkt.stream_index].send_packet(pkt, tc2.mux)
        for chain in tc2.chains.values():
            chain.finish(tc2.mux)
        tc2.mux.close()

        # the resumed second half + the first half's packets must equal
        # the uninterrupted stream: compare sample payload lengths and the
        # tail content produced after the snapshot point
        import wave

        def pcm(path):
            with wave.open(str(path)) as w:
                return w.readframes(w.getnframes())

        a = pcm(tmp_path / "a.wav")
        b2 = pcm(tmp_path / "b2.wav")
        assert len(b2) > 0
        # uninterrupted tail must exactly equal the resumed output
        assert a[len(a) - len(b2):] == b2

    def test_snapshot_is_pickleable_and_small(self, tmp_path):
        make_wav(tmp_path / "in.wav", n=9600)
        tc = Transcoder(self._spec(tmp_path / "in.wav", tmp_path / "o.wav"))
        for pkt in tc.demux.packets():
            tc.chains[pkt.stream_index].send_packet(pkt, tc.mux)
            break
        blob = checkpoint.snapshot(tc)
        assert 0 < len(blob) < 1 << 20
