"""Loopback network protocols (tcp.c / udp.c analogs)."""
import threading
import time

import numpy as np
import pytest

from librempeg_tpu.formats.io import open_io
from librempeg_tpu.utils import testgen


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTcp:
    def test_bytes_roundtrip(self):
        port = _free_port()
        payload = bytes(range(256)) * 64
        done = []

        def serve():
            io = open_io(f"tcp://127.0.0.1:{port}?listen=1", "w")
            io.write(payload)
            io.close()
            done.append(1)

        t = threading.Thread(target=serve)
        t.start()
        time.sleep(0.2)
        c = open_io(f"tcp://127.0.0.1:{port}", "r")
        got = b""
        while True:
            chunk = c.read(4096)
            if not chunk:
                break
            got += chunk
        t.join(timeout=10)
        assert got == payload and done

    def test_mpegts_over_tcp(self):
        """Stream our TS mux over a socket and demux it on the client —
        the reference's `tcp://` + mpegts streaming workflow."""
        from librempeg_tpu.codecs.api import find_encoder
        from librempeg_tpu.formats import registry  # noqa: F401
        from librempeg_tpu.formats.api import _DEMUXERS, _MUXERS

        port = _free_port()

        def serve():
            io = open_io(f"tcp://127.0.0.1:{port}?listen=1", "w")
            mux = _MUXERS["mpegts"](io)
            enc = find_encoder("mpeg4")(width=64, height=48, qscale=4)
            st = mux.add_stream(enc.codec_parameters(),
                                time_base=enc.time_base)
            for i in range(4):
                for p in enc.encode(testgen.video_frame_yuv420(64, 48, i)):
                    p.stream_index = st.index
                    mux.write(p)
            for p in enc.flush():
                p.stream_index = st.index
                mux.write(p)
            mux.write_trailer()
            io.close()

        t = threading.Thread(target=serve)
        t.start()
        time.sleep(0.2)
        io = open_io(f"tcp://127.0.0.1:{port}", "r")
        d = _DEMUXERS["mpegts"]()
        d.io = io
        d.read_header(io)
        pkts = list(d.packets())
        t.join(timeout=10)
        assert len(pkts) == 4
        assert d.streams[0].codecpar.codec_id == "mpeg4"


class TestUdp:
    def test_datagram_roundtrip(self):
        port = _free_port()
        recv = open_io(f"udp://127.0.0.1:{port}", "r")
        send = open_io(f"udp://127.0.0.1:{port}", "w")
        payload = bytes(range(200)) * 20   # multiple datagrams
        send.write(payload)
        got = b""
        while len(got) < len(payload):
            chunk = recv.read(65536)
            if not chunk:
                break
            got += chunk
        send.close()
        recv.close()
        assert got == payload
