"""H.264 intra codec tests: cross-validated with the reference decoder
(our encoder) and self-consistent (our decoder = bit-exact with both)."""
import subprocess

import numpy as np
import pytest

from librempeg_tpu.codecs.api import find_decoder, find_encoder
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.utils import testgen

from conftest import reference_ffmpeg


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))**2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def encode_frames(w, h, n, qp=24):
    enc = find_encoder("h264")(width=w, height=h, qp=qp,
                               framerate=Rational(25, 1))
    pkts = []
    frames = []
    for i in range(n):
        y, u, v = testgen.video_yuv420(w, h, i)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=w,
                       height=h, pts=i, time_base=Rational(1, 25))
        frames.append(f)
        pkts += enc.encode(f)
    return pkts, frames


class TestH264OwnPair:
    def test_roundtrip_matches_source(self):
        pkts, frames = encode_frames(64, 48, 3, qp=20)
        dec = find_decoder("h264")()
        outs = []
        for p in pkts:
            outs += dec.decode(p)
        assert len(outs) == 3
        for o, f in zip(outs, frames):
            assert psnr(o.planes[0], f.planes[0]) > 45
            assert psnr(o.planes[1], f.planes[1]) > 40

    def test_qp_quality_tradeoff(self):
        sizes = {}
        for qp in (18, 30, 40):
            pkts, _ = encode_frames(64, 48, 1, qp=qp)
            sizes[qp] = len(pkts[0].data)
        assert sizes[18] > sizes[30] > sizes[40]


@pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
class TestH264VsReference:
    def _ref_decode(self, pkts, w, h, n):
        data = b"".join(bytes(p.data) for p in pkts)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "h264",
             "-i", "pipe:0", "-f", "rawvideo", "-"],
            input=data, capture_output=True)
        assert r.returncode == 0, r.stderr.decode()[:300]
        fsz = w * h * 3 // 2
        return [np.frombuffer(r.stdout[i * fsz:i * fsz + w * h], np.uint8
                              ).reshape(h, w) for i in range(n)]

    def test_reference_decodes_ours(self):
        w, h = 96, 64
        pkts, frames = encode_frames(w, h, 3, qp=22)
        refs = self._ref_decode(pkts, w, h, 3)
        assert len(refs) == 3
        for r, f in zip(refs, frames):
            p = psnr(r, f.planes[0])
            assert p > 42, f"ref-decode PSNR {p:.1f}"

    def test_our_decoder_bit_exact_with_reference(self):
        w, h = 64, 48
        pkts, _ = encode_frames(w, h, 2, qp=26)
        refs = self._ref_decode(pkts, w, h, 2)
        dec = find_decoder("h264")()
        ours = []
        for p in pkts:
            ours += dec.decode(p)
        for o, r in zip(ours, refs):
            np.testing.assert_array_equal(np.asarray(o.planes[0]), r)


class TestH264Mp4:
    """Conformant h264-in-mp4: proper avcC record + length-prefixed
    samples (libavformat/avc.c + bsf/h264_mp4toannexb.c analogs)."""

    def _make_mp4(self, tmp_path):
        from librempeg_tpu.cli.ffmpeg import main as ffmain

        out = tmp_path / "a.mp4"
        rc = ffmain(["-v", "error", "-f", "lavfi",
                     "-i", "testsrc2=size=64x48:duration=0.3",
                     "-c:v", "h264", "-y", str(out)])
        assert rc == 0
        return out

    def test_avcc_record_and_lengths(self, tmp_path):
        out = self._make_mp4(tmp_path)
        raw = out.read_bytes()
        i = raw.find(b"avcC")
        assert i > 0 and raw[i + 4] == 1          # configurationVersion
        assert raw[i + 8] & 3 == 3                # 4-byte NAL lengths

    def test_own_roundtrip(self, tmp_path):
        from librempeg_tpu.codecs.api import find_decoder
        from librempeg_tpu.formats.api import open_input

        out = self._make_mp4(tmp_path)
        d = open_input(str(out))
        par = d.streams[0].codecpar
        assert bytes(par.extradata)[:4] == b"\x00\x00\x00\x01"
        dec = find_decoder("h264")(par)
        frames = []
        for p in d.packets():
            frames += dec.decode(p)
        assert len(frames) == 8

    def test_bsf_mp4toannexb(self):
        from librempeg_tpu.codecs.bsf import find_bsf
        from librempeg_tpu.codecs.h264.avcc import (
            annexb_to_lp,
            avcc_to_annexb,
            build_avcc,
        )
        from librempeg_tpu.codecs.h264.intra import build_pps, build_sps
        from librempeg_tpu.core.packet import Packet, PktFlags
        from librempeg_tpu.formats.api import CodecParameters

        extra = build_sps(4, 3) + build_pps()
        avcc = build_avcc(extra)
        assert avcc[0] == 1
        assert avcc_to_annexb(avcc) == extra
        payload = b"\x00\x00\x00\x01\x65" + bytes(range(20))
        lp = annexb_to_lp(payload)
        par = CodecParameters(codec_type="video", codec_id="h264",
                              extradata=avcc)
        bsf = find_bsf("h264_mp4toannexb")(par)
        got = bsf.filter(Packet(data=lp, flags=PktFlags.KEY))[0]
        assert bytes(got.data) == extra + payload

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_reference_decodes_conformant_mp4(self, tmp_path):
        import subprocess

        out = self._make_mp4(tmp_path)
        r = subprocess.run([reference_ffmpeg(), "-v", "error", "-i",
                            str(out), "-f", "framecrc", "-"],
                           capture_output=True, text=True)
        assert r.returncode == 0 and r.stderr == ""
        body = [ln for ln in r.stdout.splitlines() if not ln.startswith("#")]
        assert len(body) == 8


class TestIntra16Modes:
    """V/H/DC/Plane Intra_16x16 prediction (§8.3.3): mode selection by
    SAD, recon bit-exact with the reference across mixed-mode frames."""

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_gradient_uses_plane_and_matches_reference(self, tmp_path):
        import subprocess
        from librempeg_tpu.codecs.api import find_decoder
        from librempeg_tpu.codecs.h264 import intra as I
        from librempeg_tpu.core.packet import Packet

        yy, xx = np.mgrid[0:96, 0:128]
        y = np.clip(40 + yy + xx // 2, 0, 255).astype(np.uint8)
        u = np.full((48, 64), 120, np.uint8)
        v = np.full((48, 64), 130, np.uint8)
        data = I.build_sps(8, 6) + I.build_pps() + \
            I.encode_idr(y, u, v, qp=26, frame_idx=0)
        assert len(data) < 400      # plane mode collapses the gradient
        p = tmp_path / "g.h264"
        p.write_bytes(data)
        r = subprocess.run([reference_ffmpeg(), "-v", "error", "-f",
                            "h264", "-i", str(p), "-f", "rawvideo",
                            "-pix_fmt", "yuv420p", "-"],
                           capture_output=True)
        ref = np.frombuffer(r.stdout[:128 * 96], np.uint8).reshape(96, 128)
        dec = find_decoder("h264")()
        ours = np.asarray(dec.decode(Packet(data=data))[0].planes[0])
        np.testing.assert_array_equal(ours, ref)
        mse = np.mean((ours.astype(float) - y.astype(float)) ** 2)
        assert 10 * np.log10(255 * 255 / mse) > 45

    def test_mode_functions_match_spec_shapes(self):
        from librempeg_tpu.codecs.h264 import intra as I

        rng = np.random.RandomState(7)
        recon = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        for mode in (0, 1, 2, 3):
            p = I._pred16(recon, 1, 1, mode)
            assert p.shape == (16, 16)
            assert p.min() >= 0 and p.max() <= 255
        # V repeats the row above; H repeats the left column
        np.testing.assert_array_equal(
            I._pred16(recon, 1, 1, 0),
            np.broadcast_to(recon[15, 16:32].astype(np.int64), (16, 16)))
        np.testing.assert_array_equal(
            I._pred16(recon, 1, 1, 1),
            np.broadcast_to(recon[16:32, 15].astype(np.int64)[:, None],
                            (16, 16)))

    @pytest.mark.skipif(reference_ffmpeg() is None, reason="no reference")
    def test_chroma_modes_bit_exact(self, tmp_path):
        """Chroma V/H/Plane prediction on chroma-gradient content stays
        bit-exact with the reference on all three planes."""
        import subprocess
        from librempeg_tpu.codecs.api import find_decoder
        from librempeg_tpu.codecs.h264 import intra as I
        from librempeg_tpu.core.packet import Packet
        from librempeg_tpu.utils import testgen

        y = testgen.video_yuv420(128, 96, 1)[0]
        yy, xx = np.mgrid[0:48, 0:64]
        u = np.clip(60 + yy * 2, 0, 255).astype(np.uint8)
        v = np.clip(200 - xx * 2, 0, 255).astype(np.uint8)
        data = I.build_sps(8, 6) + I.build_pps() + \
            I.encode_idr(y, u, v, qp=24, frame_idx=0)
        p = tmp_path / "c.h264"
        p.write_bytes(data)
        r = subprocess.run([reference_ffmpeg(), "-v", "error", "-f",
                            "h264", "-i", str(p), "-f", "rawvideo",
                            "-pix_fmt", "yuv420p", "-"],
                           capture_output=True)
        n = 128 * 96
        dec = find_decoder("h264")()
        f = dec.decode(Packet(data=data))[0]
        np.testing.assert_array_equal(
            np.asarray(f.planes[0]),
            np.frombuffer(r.stdout[:n], np.uint8).reshape(96, 128))
        np.testing.assert_array_equal(
            np.asarray(f.planes[1]),
            np.frombuffer(r.stdout[n:n + n // 4],
                          np.uint8).reshape(48, 64))
        np.testing.assert_array_equal(
            np.asarray(f.planes[2]),
            np.frombuffer(r.stdout[n + n // 4:n + n // 2],
                          np.uint8).reshape(48, 64))


def test_native_recon_matches_numpy():
    """native/h264.cpp h264_recon_frame (the host fast path: residuals +
    inter MC + intra in one call) is bit-identical to the numpy
    reconstruction across all MB shapes (variety mode, I+P GOPs)."""
    import numpy as np

    from librempeg_tpu.codecs.h264 import recon as R
    from librempeg_tpu.codecs.h264.codec import H264Decoder, H264Encoder
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational
    from librempeg_tpu.native import build as native

    if not native.available():
        import pytest

        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(3)
    W, H = 96, 64
    base = rng.integers(0, 256, (H * 2, W * 2)).astype(np.uint8)
    frames = []
    for i in range(8):
        y = base[i:H + i, i * 2:W + i * 2]
        y = (y * 0.6 + 50 + rng.integers(0, 40, (H, W))) \
            .clip(0, 255).astype(np.uint8)
        u = rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(100, 156, (H // 2, W // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                 width=W, height=H, pts=i,
                                 time_base=Rational(1, 25)))
    enc = H264Encoder(width=W, height=H, qp=28, g=4, variety=1)
    pkts = [enc.encode(f)[0] for f in frames]

    dec = H264Decoder(enc.codec_parameters())
    fast = [f for p in pkts for f in dec.decode(p)]

    orig = R.reconstruct_frame_native

    def slowpath(res, mb_w, mb_h, off, ref_packs, *a, **k):
        refl = [(rp.E[R.PAD:-R.PAD, R.PAD:-R.PAD],
                 rp.U[R.PADC:-R.PADC, R.PADC:-R.PADC],
                 rp.V[R.PADC:-R.PADC, R.PADC:-R.PADC])
                for rp in ref_packs]
        return R.reconstruct_frame(res, mb_w, mb_h, off, refl)

    R.reconstruct_frame_native = slowpath
    try:
        dec2 = H264Decoder(enc.codec_parameters())
        slow = [f for p in pkts for f in dec2.decode(p)]
    finally:
        R.reconstruct_frame_native = orig

    assert len(fast) == len(slow) == len(frames)
    for a, b in zip(fast, slow):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_encoder_sps_cropping_non_aligned():
    """Non-16-aligned (even) dimensions: the encoder pads to the coded
    MB grid and signals SPS frame cropping (§7.4.2.1.1); our decoder
    and the reference decoder both return the display size, bit-exact.
    (Reference: h264_ps.c crop handling.)"""
    import shutil
    import subprocess
    import tempfile

    from librempeg_tpu.codecs.h264.codec import H264Decoder, H264Encoder

    w, h = 84, 52                    # coded 96x64, crop 12/12
    rng = np.random.default_rng(3)
    frames = []
    for i in range(4):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                 width=w, height=h, pts=i,
                                 time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=24, g=4)
    pkts = [enc.encode(f)[0] for f in frames]

    dec = H264Decoder(enc.codec_parameters())
    outs = [f for p in pkts for f in dec.decode(p)]
    assert len(outs) == 4
    for f in outs:
        assert (f.width, f.height) == (w, h)
        assert np.asarray(f.planes[0]).shape == (h, w)

    ref = shutil.which("ffmpeg", path="/root/repo/.refbuild")
    if ref:
        with tempfile.TemporaryDirectory() as td:
            bs = f"{td}/s.264"
            raw = f"{td}/o.yuv"
            open(bs, "wb").write(b"".join(bytes(p.data) for p in pkts))
            subprocess.run([ref, "-v", "error", "-i", bs, "-f",
                            "rawvideo", raw], check=True)
            data = open(raw, "rb").read()
            fsz = w * h * 3 // 2
            assert len(data) == 4 * fsz, "reference decoded 4 frames"
            for i, f in enumerate(outs):
                got = np.frombuffer(data[i * fsz:i * fsz + w * h],
                                    np.uint8).reshape(h, w)
                assert np.array_equal(np.asarray(f.planes[0]), got), \
                    f"frame {i} luma vs reference (crop applied)"


def test_ipcm_macroblocks_bit_exact():
    """I_PCM macroblocks (§7.3.5 mb_type 25, the lossless escape) in
    both I and P slices: raw-sample passthrough, deblocking quantizer 0
    (h264_cavlc.c:754), nnz contexts 16, and intra prediction from PCM
    neighbors -- bit-exact vs the reference decoder."""
    import shutil
    import subprocess
    import tempfile

    from librempeg_tpu.codecs.h264.codec import H264Decoder, H264Encoder

    w, h = 80, 48
    rng = np.random.default_rng(5)
    frames = []
    for i in range(6):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                 width=w, height=h, pts=i,
                                 time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=30, g=3, variety=1)
    pkts = [enc.encode(f)[0] for f in frames]

    dec = H264Decoder(enc.codec_parameters())
    outs = [f for p in pkts for f in dec.decode(p)]
    assert len(outs) == 6

    # PCM MBs' pixels survive losslessly through encode+decode
    mb_w = w // 16
    for fi in (0, 3):                       # IDR frames, PCM at mb 9
        my, mx = divmod(9, mb_w)
        src = np.asarray(frames[fi].planes[0])[
            my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
        # deblocking may touch the PCM MB edges; interior is lossless
        got = np.asarray(outs[fi].planes[0])[
            my * 16 + 3:my * 16 + 13, mx * 16 + 3:mx * 16 + 13]
        assert np.array_equal(got, src[3:13, 3:13])

    ref = shutil.which("ffmpeg", path="/root/repo/.refbuild")
    if ref:
        with tempfile.TemporaryDirectory() as td:
            bs = f"{td}/s.264"
            raw = f"{td}/o.yuv"
            open(bs, "wb").write(b"".join(bytes(p.data) for p in pkts))
            subprocess.run([ref, "-v", "error", "-i", bs, "-f",
                            "rawvideo", raw], check=True)
            data = open(raw, "rb").read()
            fsz = w * h * 3 // 2
            assert len(data) == 6 * fsz
            for i, f in enumerate(outs):
                got = np.frombuffer(data[i * fsz:(i + 1) * fsz],
                                    np.uint8)
                ours = np.concatenate([np.asarray(p).ravel()
                                       for p in f.planes])
                assert np.array_equal(ours, got), f"frame {i}"
