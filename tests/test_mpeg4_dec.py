"""MPEG-4 decoder tests: decode our own encoder's output and the
reference encoder's default streams; compare against the reference
decoder's output."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.mpeg4.decoder import Mpeg4BitstreamDecoder
from librempeg_tpu.codecs.mpeg4.encoder import Mpeg4Encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def ref_decode(path, w, h, n):
    out = subprocess.run(
        [reference_ffmpeg(), "-v", "error", "-f", "m4v", "-i", str(path),
         "-f", "rawvideo", "-"], capture_output=True, check=True)
    fsz = w * h * 3 // 2
    return [np.frombuffer(out.stdout[i * fsz:i * fsz + w * h], np.uint8
                          ).reshape(h, w) for i in range(n)
            if len(out.stdout) >= (i + 1) * fsz]


class TestDecodeOwn:
    def test_i_frame_roundtrip(self):
        w, h = 64, 48
        enc = Mpeg4Encoder(width=w, height=h, qscale=2)
        f = testgen.video_frame_yuv420(w, h, 1)
        data = enc.encode(f)[0].data
        dec = Mpeg4BitstreamDecoder()
        y, u, v = dec.decode_frame(bytes(data))
        p = psnr(y[:h, :w], f.planes[0])
        assert p > 34, f"decode-own I PSNR {p:.1f}"

    def test_ip_sequence_roundtrip(self):
        w, h = 64, 48
        enc = Mpeg4Encoder(width=w, height=h, qscale=3, gop_size=4)
        dec = Mpeg4BitstreamDecoder()
        for i in range(6):
            y0, u0, v0 = testgen.video_yuv420(w, h, i)
            y0 = np.roll(y0, 2 * i, axis=1)
            f = VideoFrame(planes=(y0, u0, v0), format="yuv420p", width=w,
                           height=h, pts=i, time_base=Rational(1, 25))
            data = enc.encode(f)[0].data
            y, u, v = dec.decode_frame(bytes(data))
            p = psnr(y[:h, :w], y0)
            assert p > 30, f"frame {i} PSNR {p:.1f}"


@pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
class TestDecodeVsReference:
    def test_matches_reference_decoder_on_our_stream(self, tmp_path):
        """Both decoders on OUR encoder's stream: outputs nearly equal."""
        w, h = 96, 64
        enc = Mpeg4Encoder(width=w, height=h, qscale=4, gop_size=3)
        dec = Mpeg4BitstreamDecoder()
        blob = b""
        ours = []
        for i in range(5):
            y0, u0, v0 = testgen.video_yuv420(w, h, i)
            y0 = np.roll(y0, i, axis=0)
            f = VideoFrame(planes=(y0, u0, v0), format="yuv420p", width=w,
                           height=h, pts=i, time_base=Rational(1, 25))
            data = bytes(enc.encode(f)[0].data)
            blob += data
            y, u, v = dec.decode_frame(data)
            ours.append(y[:h, :w].copy())
        m4v = tmp_path / "ours.m4v"
        m4v.write_bytes(blob)
        refs = ref_decode(m4v, w, h, 5)
        assert len(refs) == 5
        for i in range(5):
            p = psnr(ours[i], refs[i])
            assert p > 45, f"frame {i}: decoder mismatch PSNR {p:.1f}"

    def test_decode_reference_encoded_stream(self, tmp_path):
        """Decode a stream from the reference's own mpeg4 encoder."""
        w, h = 64, 48
        frames = []
        raw = b""
        for i in range(5):
            y, u, v = testgen.video_yuv420(w, h, i)
            y = np.roll(y, i, axis=1)
            frames.append(y)
            raw += y.tobytes() + u.tobytes() + v.tobytes()
        rf = tmp_path / "in.yuv"
        rf.write_bytes(raw)
        m4v = tmp_path / "ref.m4v"
        subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv420p", "-s", f"{w}x{h}", "-i", str(rf),
             "-c:v", "mpeg4", "-q:v", "4", "-g", "3", "-y", str(m4v)],
            check=True)
        refs = ref_decode(m4v, w, h, 5)

        # split the stream per VOP for packetized decode
        data = m4v.read_bytes()
        dec = Mpeg4BitstreamDecoder()
        import re

        vop_positions = [m.start() for m in
                         re.finditer(b"\x00\x00\x01\xb6", data)]
        assert len(vop_positions) == 5
        starts = [0] + vop_positions[1:]
        for i in range(5):
            end = vop_positions[i + 1] if i + 1 < 5 else len(data)
            out = dec.decode_frame(data[starts[i]:end])
            assert out is not None, f"frame {i} not decoded"
            y = out[0][:h, :w]
            p = psnr(y, refs[i])
            assert p > 40, f"frame {i}: PSNR vs reference decode {p:.1f}"
