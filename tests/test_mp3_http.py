"""MP3/MP2 container + ID3v2 + HTTP protocol tests, cross-validated
against the reference ffmpeg/ffprobe where applicable."""
import http.server
import io
import os
import socket
import subprocess
import threading

import numpy as np
import pytest

from librempeg_tpu.formats import id3v2
from librempeg_tpu.formats.api import open_input, open_output
from librempeg_tpu.formats.io import open_io

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "ffmpeg")
REFPROBE = os.path.join(os.path.dirname(__file__), "..", ".refbuild",
                        "ffprobe")
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference ffmpeg not built")


def make_mp2(tmp_path, seconds=1.0, tag=None):
    """Reference-encoded MP2 stream as raw .mp2 (the reference build may
    lack the mp3 muxer, so the frames travel via matroska and our own
    mkv demuxer extracts them — raw MPEG audio is self-framing)."""
    pcm = tmp_path / "in.pcm"
    t = np.arange(int(44100 * seconds)) / 44100.0
    s = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    pcm.write_bytes(np.stack([s, s], 1).tobytes())
    mkv = tmp_path / "t.mkv"
    subprocess.run([REF, "-v", "error", "-f", "s16le", "-ar", "44100",
                    "-ac", "2", "-i", str(pcm), "-c:a", "mp2",
                    str(mkv), "-y"], check=True)
    d = open_input(str(mkv))
    data = b"".join(bytes(p.data) for p in d.packets())
    if tag:
        data = id3v2.write(tag) + data
    out = tmp_path / "t.mp2"
    out.write_bytes(data)
    return out


@needs_ref
class TestMp3Container:
    def test_demux_reference_mp2(self, tmp_path):
        path = make_mp2(tmp_path)
        d = open_input(str(path))
        par = d.streams[0].codecpar
        assert par.codec_id == "mp2"
        assert par.sample_rate == 44100 and par.nb_channels == 2
        pkts = list(d.packets())
        assert len(pkts) >= 37               # ~1s at 1152 samples/frame
        sizes = {len(bytes(p.data)) for p in pkts}
        assert len(sizes) <= 2 and max(sizes) - min(sizes) <= 1, \
            sizes                             # CBR +- padding bit
        # pts advance by frame duration
        assert pkts[1].pts - pkts[0].pts == 1152

    def test_id3_roundtrip_with_reference(self, tmp_path):
        meta = {"title": "Sine Test", "artist": "librempeg-tpu",
                "album": "Round 2"}
        path = make_mp2(tmp_path, tag=meta)
        # our demuxer reads the tag
        d = open_input(str(path))
        assert d.metadata["title"] == "Sine Test"
        assert d.metadata["artist"] == "librempeg-tpu"
        # the reference reads our tag from a remuxed file
        out = tmp_path / "out.mp3"
        mux = open_output(str(out), format="mp3")
        mux.metadata.update(meta)
        mux.add_stream(d.streams[0].codecpar, d.streams[0].time_base)
        mux.write_header()
        for p in d.packets():
            p.stream_index = 0
            mux.write(p)
        mux.close()
        probe = subprocess.run(
            [REFPROBE, "-v", "error", "-show_format", str(out)],
            capture_output=True, text=True, check=True).stdout
        assert "TAG:title=Sine Test" in probe
        assert "TAG:artist=librempeg-tpu" in probe
        # and the reference can decode the remuxed audio
        subprocess.run([REF, "-v", "error", "-i", str(out), "-f", "null",
                        "-"], check=True)

    def test_parse_reference_id3(self, tmp_path):
        """Tag written by the reference mp3 muxer parses on our side."""
        src = make_mp2(tmp_path)
        out = tmp_path / "ref_tagged.mp3"
        r = subprocess.run([REF, "-v", "error", "-i", str(src), "-c", "copy",
                            "-metadata", "title=RefTitle", "-f", "mp3",
                            str(out), "-y"], capture_output=True)
        if r.returncode != 0:      # reference mp3 muxer may reject mp2
            pytest.skip("reference mp3 muxer rejects mp2 payload")
        d = open_input(str(out))
        assert d.metadata.get("title") == "RefTitle"


class _Handler(http.server.SimpleHTTPRequestHandler):
    droppy = False
    _dropped = set()

    def log_message(self, *a):
        pass

    def do_GET(self):
        path = self.translate_path(self.path)
        with open(path, "rb") as f:
            data = f.read()
        rng = self.headers.get("Range")
        status, start = 200, 0
        if rng and rng.startswith("bytes="):
            start = int(rng.split("=")[1].split("-")[0])
            status = 206
        body = data[start:]
        if _Handler.droppy and self.path not in _Handler._dropped \
                and status == 200:
            # simulate a mid-stream connection drop halfway through
            _Handler._dropped.add(self.path)
            self.send_response(status)
            self.send_header("Accept-Ranges", "bytes")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body[:len(body) // 2])
            self.wfile.flush()
            self.connection.close()
            return
        self.send_response(status)
        self.send_header("Accept-Ranges", "bytes")
        self.send_header("Content-Length", str(len(body)))
        if status == 206:
            self.send_header("Content-Range",
                             f"bytes {start}-{len(data)-1}/{len(data)}")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def http_server(tmp_path):
    os.chdir(tmp_path)
    _Handler.droppy = False
    _Handler._dropped = set()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), _Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield port
    srv.shutdown()


@needs_ref
class TestHttpProtocol:
    def test_demux_over_http(self, tmp_path, http_server):
        make_mp2(tmp_path)
        d_http = open_input(f"http://127.0.0.1:{http_server}/t.mp2")
        d_file = open_input(str(tmp_path / "t.mp2"))
        p1 = [bytes(p.data) for p in d_http.packets()]
        p2 = [bytes(p.data) for p in d_file.packets()]
        assert p1 == p2 and len(p1) >= 37

    def test_http_range_seek(self, tmp_path, http_server):
        path = make_mp2(tmp_path)
        data = path.read_bytes()
        ioc = open_io(f"http://127.0.0.1:{http_server}/t.mp2")
        assert ioc.seekable
        head = ioc.read(100)
        assert head == data[:100]
        ioc.seek(len(data) - 64)
        assert ioc.read(64) == data[-64:]
        ioc.seek(0)
        assert ioc.read(16) == data[:16]

    def test_http_reconnect_mid_stream(self, tmp_path, http_server):
        """Server drops the connection halfway; the client must resume
        via a ranged request (reference http.c reconnect semantics)."""
        path = make_mp2(tmp_path)
        data = path.read_bytes()
        _Handler.droppy = True
        ioc = open_io(f"http://127.0.0.1:{http_server}/t.mp2")
        got = ioc.read(len(data))
        assert got == data
