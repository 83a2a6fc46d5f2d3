"""Codec parser registry: incremental framing matches whole-stream
framing, on real encoder output."""
import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_encoder
from librempeg_tpu.codecs.parsers import find_parser, parsers
from librempeg_tpu.utils import testgen


def encode_stream(codec, n=4, **opts):
    enc = find_encoder(codec)(width=64, height=48, **opts)
    out = []
    for i in range(n):
        out += enc.encode(testgen.video_frame_yuv420(64, 48, i))
    out += enc.flush()
    return [bytes(p.data) for p in out]


def run_parser(name, data, chunk):
    p = find_parser(name)
    frames = []
    for i in range(0, len(data), chunk):
        frames += p.parse(data[i:i + chunk])
    frames += p.flush()
    return frames


class TestParsers:
    def test_registry(self):
        names = set(parsers())
        assert {"h264", "mpeg4video", "mjpeg", "flac"} <= names

    @pytest.mark.parametrize("chunk", [7, 256, 1 << 20])
    def test_h264_reframes_stream(self, chunk):
        pkts = encode_stream("h264", qp=30)
        blob = b"".join(pkts)
        frames = run_parser("h264", blob, chunk)
        assert len(frames) == len(pkts)
        assert b"".join(frames) == blob
        # each frame contains exactly one slice NAL
        for f in frames:
            from librempeg_tpu.codecs.h264.parse import split_annexb

            assert sum((nal[0] & 0x1F) in (1, 5)
                       for nal in split_annexb(f)) == 1

    @pytest.mark.parametrize("chunk", [11, 1 << 20])
    def test_mpeg4_reframes_stream(self, chunk):
        pkts = encode_stream("mpeg4", qscale=4)
        blob = b"".join(pkts)
        frames = run_parser("mpeg4video", blob, chunk)
        assert len(frames) == len(pkts)
        assert b"".join(frames) == blob

    def test_mjpeg_reframes_stream(self):
        pkts = encode_stream("mjpeg")
        blob = b"".join(pkts)
        frames = run_parser("mjpeg", blob, 100)
        assert frames == pkts

    def test_incremental_equals_oneshot(self):
        pkts = encode_stream("h264", qp=26)
        blob = b"".join(pkts)
        assert run_parser("h264", blob, 13) == run_parser(
            "h264", blob, 1 << 20)
