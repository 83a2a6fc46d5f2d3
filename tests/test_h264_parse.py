"""H.264 bitstream-foundation tests: golomb coding, NAL splitting,
SPS/PPS roundtrip via a locally built writer."""
import numpy as np
import pytest

from librempeg_tpu.codecs.flac.bitio import BitWriterMSB
from librempeg_tpu.codecs.h264.parse import (
    ExpGolombReader,
    H264StreamParser,
    NalUnit,
    parse_pps,
    parse_sps,
    remove_emulation_prevention,
    split_annexb,
)


def write_ue(bw: BitWriterMSB, v: int):
    k = v + 1
    n = k.bit_length()
    bw.write(0, n - 1)
    bw.write(k, n)


def write_se(bw: BitWriterMSB, v: int):
    write_ue(bw, 2 * v - 1 if v > 0 else -2 * v)


class TestGolomb:
    def test_ue_roundtrip(self):
        bw = BitWriterMSB()
        vals = [0, 1, 2, 3, 7, 100, 255, 1000]
        for v in vals:
            write_ue(bw, v)
        bw.align()
        g = ExpGolombReader(bw.bytes())
        assert [g.ue() for _ in vals] == vals

    def test_se_roundtrip(self):
        bw = BitWriterMSB()
        vals = [0, 1, -1, 2, -2, 26, -26, 100]
        for v in vals:
            write_se(bw, v)
        bw.align()
        g = ExpGolombReader(bw.bytes())
        assert [g.se() for _ in vals] == vals


class TestNal:
    def test_emulation_prevention(self):
        assert remove_emulation_prevention(
            b"\x00\x00\x03\x01\x00\x00\x03\x00") == b"\x00\x00\x01\x00\x00\x00"

    def test_split_annexb(self):
        stream = b"\x00\x00\x00\x01\x67AA\x00\x00\x01\x68B\x00\x00\x01\x65CC"
        nals = split_annexb(stream)
        assert len(nals) == 3
        assert nals[0][0] == 0x67
        assert nals[1][0] == 0x68
        assert nals[2][0] == 0x65

    def test_nal_header(self):
        n = NalUnit.parse(b"\x67\x42")
        assert n.type == 7 and n.ref_idc == 3


def build_sps(width_mbs=40, height_mbs=30):
    """Constructs a baseline SPS rbsp (spec §7.3.2.1 syntax order)."""
    bw = BitWriterMSB()
    bw.write(66, 8)       # profile baseline
    bw.write(0, 8)        # constraints
    bw.write(30, 8)       # level 3.0
    write_ue(bw, 0)       # sps id
    write_ue(bw, 0)       # log2_max_frame_num - 4
    write_ue(bw, 0)       # poc type 0
    write_ue(bw, 0)       # log2_max_poc_lsb - 4
    write_ue(bw, 1)       # max_num_ref_frames
    bw.write(0, 1)        # gaps allowed
    write_ue(bw, width_mbs - 1)
    write_ue(bw, height_mbs - 1)
    bw.write(1, 1)        # frame_mbs_only
    bw.write(1, 1)        # direct_8x8
    bw.write(0, 1)        # no cropping
    bw.write(0, 1)        # no vui
    bw.write(1, 1)        # rbsp stop bit
    bw.align()
    return bw.bytes()


def build_pps():
    bw = BitWriterMSB()
    write_ue(bw, 0)       # pps id
    write_ue(bw, 0)       # sps id
    bw.write(0, 1)        # cavlc
    bw.write(0, 1)        # pic_order_present
    write_ue(bw, 0)       # one slice group
    write_ue(bw, 0)       # ref l0 - 1
    write_ue(bw, 0)       # ref l1 - 1
    bw.write(0, 1)        # weighted pred
    bw.write(0, 2)        # weighted bipred
    write_se(bw, 0)       # qp - 26
    write_se(bw, 0)       # qs
    write_se(bw, 0)       # chroma offset
    bw.write(1, 1)        # deblocking control present
    bw.write(0, 1)        # constrained intra
    bw.write(0, 1)        # redundant pic cnt
    bw.write(1, 1)        # stop bit
    bw.align()
    return bw.bytes()


class TestPs:
    def test_sps_parse(self):
        s = parse_sps(build_sps())
        assert s.profile_idc == 66
        assert (s.width, s.height) == (640, 480)
        assert s.frame_mbs_only

    def test_pps_parse(self):
        p = parse_pps(build_pps())
        assert p.entropy_coding_mode == 0
        assert p.pic_init_qp == 26
        assert p.deblocking_filter_control_present

    def test_stream_parser(self):
        stream = (b"\x00\x00\x00\x01\x67" + build_sps()
                  + b"\x00\x00\x01\x68" + build_pps())
        p = H264StreamParser()
        nals = p.feed(stream)
        assert [n.type for n in nals] == [7, 8]
        assert (p.width, p.height) == (640, 480)
