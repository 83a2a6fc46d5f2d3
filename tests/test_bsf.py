"""Bitstream filter tests."""
import numpy as np

from librempeg_tpu.codecs.bsf import bsfs, find_bsf
from librempeg_tpu.core.packet import Packet, PktFlags


class TestBsf:
    def test_registry(self):
        assert {"null", "chomp", "noise", "setts", "dump_extra"} <= set(bsfs())

    def test_chomp(self):
        f = find_bsf("chomp")()
        out = f.filter(Packet(data=b"abc\x00\x00"))
        assert out[0].data == b"abc"

    def test_noise_deterministic(self):
        f1 = find_bsf("noise")(amount=8, seed=42)
        f2 = find_bsf("noise")(amount=8, seed=42)
        p = Packet(data=bytes(range(64)))
        a = f1.filter(p)[0]
        b = f2.filter(p)[0]
        assert a.data == b.data
        assert a.data != p.data
        assert a.flags & PktFlags.CORRUPT

    def test_noise_drop(self):
        f = find_bsf("noise")(drop=100)
        assert f.filter(Packet(data=b"x" * 100)) == []

    def test_setts(self):
        f = find_bsf("setts")(offset=10, scale_num=2)
        out = f.filter(Packet(data=b"x", pts=5, dts=5))
        assert out[0].pts == 20

    def test_dump_extra(self):
        from librempeg_tpu.formats.api import CodecParameters

        par = CodecParameters(extradata=b"HDR")
        f = find_bsf("dump_extra")(par)
        out = f.filter(Packet(data=b"payload", flags=PktFlags.KEY))
        assert out[0].data == b"HDRpayload"
