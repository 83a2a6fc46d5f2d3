"""RTP depacketization + SDP/RTSP demuxers.

Self-contained RFC-conformance tests: RTP packets are built by hand
per RFC 6184/3640/3550 around payloads from our own encoders, sent
through loopback sockets, and the depacketized elementary streams must
decode bit-exactly. When the reference build has networking enabled,
test_rtsp_record_push_reference cross-validates against a real ffmpeg
RTSP push.
"""
import os
import shutil
import socket
import struct
import subprocess
import tempfile
import threading
import time

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder
from librempeg_tpu.codecs.h264.codec import H264Encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.formats.api import open_input
from librempeg_tpu.formats.rtp import RtpStreamCtx, parse_sdp

REF = shutil.which("ffmpeg", path="/root/repo/.refbuild")


def _h264_stream(n=10, w=96, h=64):
    rng = np.random.default_rng(0)
    enc = H264Encoder(width=w, height=h, qp=28, g=8)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.uint8)
    pkts = []
    for i in range(n):
        y = base[i:h + i, i * 2:w + i * 2]
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 100, np.uint8)
        pkts += enc.encode(VideoFrame(planes=(y.copy(), u, v),
                                      format="yuv420p", width=w,
                                      height=h, pts=i,
                                      time_base=Rational(1, 25)))
    return enc, pkts


def _rtp(pt, seq, ts, payload, marker=0):
    return struct.pack(">BBHII", 0x80, (marker << 7) | pt,
                       seq & 0xFFFF, ts & 0xFFFFFFFF, 0x1234) + payload


def _packetize_h264(pkts, mtu=600):
    """RFC 6184 packetizer (single NAL + FU-A) for the test."""
    from librempeg_tpu.codecs.h264.parse import split_annexb

    out = []
    seq = 100
    for fi, pkt in enumerate(pkts):
        ts = 90000 * fi // 25
        nals = split_annexb(bytes(pkt.data))
        for ni, nal in enumerate(nals):
            last_nal = ni == len(nals) - 1
            if len(nal) <= mtu:
                out.append(_rtp(96, seq, ts, nal, marker=last_nal))
                seq += 1
            else:
                hdr = nal[0]
                body = nal[1:]
                off = 0
                while off < len(body):
                    chunk = body[off:off + mtu]
                    s = 1 if off == 0 else 0
                    e = 1 if off + mtu >= len(body) else 0
                    fu = bytes([(hdr & 0xE0) | 28,
                                (s << 7) | (e << 6) | (hdr & 0x1F)])
                    out.append(_rtp(96, seq, ts, fu + chunk,
                                    marker=last_nal and e))
                    seq += 1
                    off += mtu
    return out


def _decode_all(par, pkts, codec):
    dec = find_decoder(codec)(par)
    frames = []
    for p in pkts:
        frames += [np.asarray(f.planes[0]) for f in dec.decode(p)]
    frames += [np.asarray(f.planes[0]) for f in dec.flush()]
    return frames


def test_h264_depacketize_fua_and_reorder():
    enc, es = _h264_stream()
    rtp_pkts = _packetize_h264(es)
    # shuffle mildly (swap adjacent pairs) to exercise the reorder
    shuffled = rtp_pkts[:]
    for i in range(0, len(shuffled) - 1, 4):
        shuffled[i], shuffled[i + 1] = shuffled[i + 1], shuffled[i]

    media = {"type": "video", "port": 0, "proto": "RTP/AVP", "pt": 96,
             "rtpmap": ("h264", 90000, 1), "fmtp": {}, "conn": "",
             "control": ""}
    ctx = RtpStreamCtx(media, 0)
    out = []
    for raw in shuffled:
        out += ctx.push(raw)
    out += ctx.flush()
    got = _decode_all(enc.codec_parameters(), out, "h264")
    want = _decode_all(enc.codec_parameters(), es, "h264")
    assert len(got) == len(want) == 10
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_sdp_parse_and_aac_au_headers():
    sdp = """v=0
o=- 0 0 IN IP4 127.0.0.1
s=t
c=IN IP4 127.0.0.1
m=audio 4000 RTP/AVP 97
a=rtpmap:97 mpeg4-generic/48000/2
a=fmtp:97 sizelength=13;indexlength=3;config=1190
m=video 4002 RTP/AVP 96
a=rtpmap:96 H264/90000
"""
    medias = parse_sdp(sdp)
    assert len(medias) == 2
    assert medias[0]["rtpmap"] == ("mpeg4-generic", 48000, 2)
    assert medias[0]["fmtp"]["sizelength"] == "13"
    assert medias[1]["rtpmap"] == ("h264", 90000, 1)

    ctx = RtpStreamCtx(medias[0], 0)
    assert ctx.codecpar().codec_id == "aac"
    assert ctx.codecpar().extradata == bytes.fromhex("1190")
    # two AUs of 3 and 5 bytes: AU-headers-length = 32 bits
    au1, au2 = b"\x01\x02\x03", b"\x04\x05\x06\x07\x08"
    hdr = struct.pack(">H", 32) \
        + struct.pack(">H", (3 << 3)) + struct.pack(">H", (5 << 3))
    out = ctx.push(_rtp(97, 1, 0, hdr + au1 + au2, marker=1))
    assert [bytes(p.data) for p in out] == [au1, au2]


def test_g711_static_payload():
    media = {"type": "audio", "port": 0, "proto": "RTP/AVP", "pt": 0,
             "rtpmap": None, "fmtp": {}, "conn": "", "control": ""}
    ctx = RtpStreamCtx(media, 0)
    assert ctx.codecpar().codec_id == "pcm_mulaw"
    assert ctx.codecpar().sample_rate == 8000
    out = ctx.push(_rtp(0, 5, 1000, bytes(range(160)), marker=0))
    assert len(out) == 1 and len(out[0].data) == 160


@pytest.mark.slow
def test_rtsp_record_push_loopback():
    """Scripted RTSP pushing peer (ANNOUNCE/SETUP/RECORD + interleaved
    RTP) against our listen demuxer; depacketized stream must decode
    bit-exactly."""
    enc, es = _h264_stream(n=8)
    rtp_pkts = _packetize_h264(es)
    port = 18600 + os.getpid() % 200
    results = {}

    def pull():
        dmx = open_input(f"rtsp://127.0.0.1:{port}/x?listen=1",
                         format="rtsp", timeout=15)
        results["codec"] = dmx.streams[0].codecpar.codec_id
        out = list(dmx.packets())
        results["frames"] = _decode_all(enc.codec_parameters(), out,
                                        "h264")

    t = threading.Thread(target=pull)
    t.start()
    time.sleep(0.5)

    sdp = ("v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\ns=x\r\n"
           "c=IN IP4 127.0.0.1\r\nt=0 0\r\n"
           "m=video 0 RTP/AVP 96\r\na=rtpmap:96 H264/90000\r\n"
           "a=control:streamid=0\r\n")
    sock = socket.create_connection(("127.0.0.1", port), timeout=10)
    f = sock.makefile("rwb")

    def req(method, url, hdrs, body=b""):
        lines = [f"{method} {url} RTSP/1.0", "CSeq: 1"]
        for k, v in hdrs.items():
            lines.append(f"{k}: {v}")
        if body:
            lines.append(f"Content-Length: {len(body)}")
        f.write(("\r\n".join(lines) + "\r\n\r\n").encode() + body)
        f.flush()
        status = f.readline()
        assert b"200" in status, status
        while True:
            ln = f.readline()
            if ln in (b"\r\n", b"\n", b""):
                break

    base = f"rtsp://127.0.0.1:{port}/x"
    req("ANNOUNCE", base, {"Content-Type": "application/sdp"},
        sdp.encode())
    req("SETUP", base + "/streamid=0",
        {"Transport": "RTP/AVP/TCP;unicast;interleaved=0-1"})
    req("RECORD", base, {"Session": "librempeg-tpu"})
    for raw in rtp_pkts:
        f.write(b"$" + bytes([0]) + struct.pack(">H", len(raw)) + raw)
    f.flush()
    sock.close()

    t.join(timeout=30)
    assert results.get("codec") == "h264"
    want = _decode_all(enc.codec_parameters(), es, "h264")
    got = results.get("frames", [])
    assert len(got) == len(want) == 8
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


@pytest.mark.skipif(
    REF is None or b"rtsp" not in subprocess.run(
        [REF or "true", "-hide_banner", "-muxers"],
        capture_output=True).stdout,
    reason="reference build lacks RTSP")
def test_rtsp_record_push_reference():
    """The reference ffmpeg pushes H.264 over RTSP (interleaved TCP) to
    our listen demuxer; output must decode bit-exactly vs the file."""
    enc, es = _h264_stream(n=12)
    with tempfile.TemporaryDirectory() as td:
        esf = os.path.join(td, "in.264")
        src = os.path.join(td, "in.mp4")
        open(esf, "wb").write(b"".join(bytes(p.data) for p in es))
        subprocess.run([REF, "-v", "error", "-y", "-i", esf, "-c",
                        "copy", src], check=True)
        port = 18800 + os.getpid() % 200
        results = {}

        def pull():
            dmx = open_input(f"rtsp://127.0.0.1:{port}/p?listen=1",
                             format="rtsp", timeout=20)
            out = list(dmx.packets())
            results["frames"] = _decode_all(enc.codec_parameters(),
                                            out, "h264")

        t = threading.Thread(target=pull)
        t.start()
        time.sleep(0.8)
        r = subprocess.run(
            [REF, "-v", "error", "-i", src, "-c", "copy", "-f", "rtsp",
             "-rtsp_transport", "tcp", f"rtsp://127.0.0.1:{port}/p"],
            capture_output=True, text=True, timeout=60)
        t.join(timeout=40)
        assert r.returncode == 0, r.stderr[-300:]

        dmx = open_input(src)
        want = _decode_all(enc.codec_parameters(),
                           list(dmx.packets()), "h264")
        got = results.get("frames", [])
        assert len(got) == len(want) == 12
        for a, b in zip(got, want):
            assert np.array_equal(a, b)
