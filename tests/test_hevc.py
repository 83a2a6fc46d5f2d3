"""HEVC Main-intra decoder conformance vs the reference decoder.

Streams come from the syntax-level generator (codecs/hevc/decoder.py
generate_stream): randomized legal quadtrees, intra modes, and CABAC
residuals, decoded by BOTH the reference ffmpeg and our decoder;
outputs must match bit-for-bit (FATE's oracle, as for H.264/MPEG-2).
"""
import subprocess

import numpy as np
import pytest

from conftest import reference_ffmpeg

pytestmark = pytest.mark.skipif(reference_ffmpeg() is None,
                                reason="reference not built")


def ref_decode(stream: bytes, w, h):
    import os
    import tempfile
    fd, path = tempfile.mkstemp(suffix=".hevc")
    try:
        os.write(fd, stream)
        os.close(fd)
        out = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-f", "hevc",
             "-i", path, "-f", "rawvideo", "-"],
            capture_output=True)
    finally:
        os.unlink(path)
    fsz = w * h * 3 // 2
    frames = []
    for i in range(len(out.stdout) // fsz):
        buf = out.stdout[i * fsz:(i + 1) * fsz]
        frames.append((
            np.frombuffer(buf[:w * h], np.uint8).reshape(h, w),
            np.frombuffer(buf[w * h:w * h * 5 // 4],
                          np.uint8).reshape(h // 2, w // 2),
            np.frombuffer(buf[w * h * 5 // 4:],
                          np.uint8).reshape(h // 2, w // 2)))
    return frames, out.stderr.decode()


def our_decode(stream: bytes):
    from librempeg_tpu.codecs.hevc.decoder import HevcDecoder
    from librempeg_tpu.core.packet import Packet

    dec = HevcDecoder()
    frames = dec.decode(Packet(data=stream, pts=0))
    frames.extend(dec.flush())          # drain the B reorder queue
    return [f.planes for f in frames]


def check(w=64, h=64, **kw):
    from librempeg_tpu.codecs.hevc.decoder import generate_stream

    stream = generate_stream(w, h, **kw)
    ref, err = ref_decode(stream, w, h)
    assert ref, f"reference rejected generated stream: {err}"
    assert not err, err
    ours = our_decode(stream)
    assert len(ours) == len(ref) == kw.get("n_frames", 1)
    for rf, of in zip(ref, ours):
        for a, b in zip(rf, of):
            np.testing.assert_array_equal(a, np.asarray(b))


def test_cabac_roundtrip():
    import random

    from librempeg_tpu.codecs.hevc.cabac import (CabacDecoder,
                                                 CabacEncoder)
    rng = random.Random(7)
    ops = [(rng.randrange(3), rng.randrange(2), rng.randrange(150))
           for _ in range(4000)]
    enc = CabacEncoder(0, 30)
    for kind, bit, ctx in ops:
        if kind == 0:
            enc.encode_decision(ctx, bit)
        elif kind == 1:
            enc.encode_bypass(bit)
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.bytes(), 0, 0, 30)
    for kind, bit, ctx in ops:
        if kind == 0:
            assert dec.decision(ctx) == bit
        elif kind == 1:
            assert dec.bypass() == bit
    assert dec.terminate() == 1 and not dec.error


def test_flat_intra():
    check(split_prob=0.0, density=0.0, seed=0)


def test_residuals():
    check(split_prob=0.0, density=0.3, seed=1)


def test_quadtree_splits():
    check(split_prob=0.5, nxn_prob=0.4, seed=2)


def test_high_amplitude():
    check(amp=40, seed=3)


def test_qp_extremes():
    check(qp=12, seed=4)
    check(qp=45, seed=5)


def test_multiframe_nonsquare():
    check(w=96, h=64, split_prob=0.5, nxn_prob=0.5, seed=6, n_frames=2)


def test_ctb_sizes():
    check(ctb_log2=6, split_prob=0.6, seed=7)
    check(ctb_log2=4, split_prob=0.4, nxn_prob=0.5, seed=8)


def test_seed_sweep():
    for s in range(30, 36):
        check(split_prob=0.45, nxn_prob=0.4, density=0.35, amp=12,
              seed=s)


def test_p_frames_basic():
    check(n_frames=6, seed=21, split_prob=0.4, p_frames=True)


def test_p_frames_merge_cands():
    check(n_frames=5, seed=22, max_merge=1, p_frames=True)
    check(n_frames=5, seed=23, max_merge=2, p_frames=True)


def test_p_frames_qp_extremes():
    check(n_frames=4, seed=24, qp=12, p_frames=True)
    check(n_frames=4, seed=25, qp=45, p_frames=True)


def test_p_frames_nonsquare_parts():
    check(w=96, h=64, n_frames=5, seed=26, split_prob=0.5,
          nxn_prob=0.4, p_frames=True)


def test_p_frames_ctb_sizes():
    check(ctb_log2=4, n_frames=3, seed=27, split_prob=0.4,
          p_frames=True)
    check(ctb_log2=6, n_frames=3, seed=28, split_prob=0.6,
          p_frames=True)


def test_b_frames_basic():
    check(n_frames=5, seed=40, split_prob=0.4, b_frames=True)


def test_b_frames_merge_cands():
    check(n_frames=5, seed=41, max_merge=1, b_frames=True)
    check(n_frames=5, seed=42, max_merge=3, b_frames=True)


def test_b_frames_mvd_l1_zero():
    check(n_frames=5, seed=43, b_frames=True, mvd_l1_zero=True)


def test_b_frames_parts_and_ctb():
    check(w=96, h=64, n_frames=5, seed=44, split_prob=0.5,
          nxn_prob=0.4, b_frames=True)
    check(ctb_log2=4, n_frames=5, seed=45, split_prob=0.4,
          b_frames=True)


def test_b_frames_deblock():
    check(n_frames=5, seed=46, b_frames=True, deblock=True)


def test_b_frames_sao():
    check(n_frames=5, seed=47, b_frames=True, deblock=True, sao=True)


@pytest.mark.slow
def test_b_frames_sweep():
    for s in range(50, 56):
        check(n_frames=7, seed=s, split_prob=0.45, nxn_prob=0.4,
              density=0.35, amp=12, b_frames=True,
              deblock=(s % 2 == 0), sao=(s % 3 == 0))


@pytest.mark.slow
def test_b_frames_multi_slice():
    check(n_frames=5, seed=60, b_frames=True, slices=3)
    check(n_frames=5, seed=61, b_frames=True, slices=2, deblock=True,
          sao=True)


def test_hvcc_roundtrip():
    from librempeg_tpu.codecs.hevc.decoder import generate_stream
    from librempeg_tpu.codecs.hevc.hvcc import (annexb_to_lp,
                                                build_hvcc,
                                                hvcc_to_annexb,
                                                lp_to_annexb,
                                                nal_length_size)
    from librempeg_tpu.codecs.hevc.ps import split_nals

    data = generate_stream(64, 64, seed=10)
    cfg = bytearray()
    for t, nal in split_nals(data, raw=True):
        if t in (32, 33, 34):
            cfg += b"\x00\x00\x00\x01" + nal
    rec = build_hvcc(bytes(cfg))
    assert rec[:1] == b"\x01" and nal_length_size(rec) == 4
    assert hvcc_to_annexb(rec) == bytes(cfg)
    lp = annexb_to_lp(data, strip_ps=True)
    back = lp_to_annexb(lp, 4, force=True)
    assert all(t < 32 for t, _ in split_nals(back))


def test_container_roundtrip(tmp_path):
    """annex-B -> mkv/mp4/ts (our mux) -> our demux+decode, and the
    reference decoding our muxed files, all bit-equal."""
    import numpy as np

    from librempeg_tpu.codecs.hevc.decoder import generate_stream

    src = tmp_path / "t.hevc"
    data = generate_stream(64, 64, n_frames=2, seed=12,
                           split_prob=0.4)
    src.write_bytes(data)
    want = our_decode(data)
    for ext in ("mkv", "mp4", "ts"):
        dst = tmp_path / f"t.{ext}"
        subprocess.run(
            ["python", "-m", "librempeg_tpu.cli.ffmpeg", "-v", "error",
             "-i", str(src), "-c", "copy", "-y", str(dst)],
            check=True, capture_output=True)
        r = subprocess.run(
            [reference_ffmpeg(), "-v", "error", "-i", str(dst),
             "-f", "rawvideo", "-"], capture_output=True)
        assert not r.stderr.decode(), (ext, r.stderr.decode())
        fsz = 64 * 64 * 3 // 2
        assert len(r.stdout) == fsz * 2, ext
        for i, planes in enumerate(want):
            buf = r.stdout[i * fsz:(i + 1) * fsz]
            flat = np.concatenate([np.asarray(p).ravel()
                                   for p in planes])
            assert bytes(flat.astype(np.uint8)) == buf, ext


def test_demuxer_probe_and_split():
    from librempeg_tpu.codecs.hevc.decoder import generate_stream
    from librempeg_tpu.formats.rawes import HevcDemuxer

    data = generate_stream(64, 64, n_frames=3, seed=9)
    assert HevcDemuxer.probe(data) > 0

    import io

    from librempeg_tpu.formats.io import IOContext

    dmx = HevcDemuxer()
    dmx.read_header(IOContext(io.BytesIO(data)))
    assert dmx.streams[0].codecpar.codec_id == "hevc"
    assert (dmx.streams[0].codecpar.width,
            dmx.streams[0].codecpar.height) == (64, 64)
    pkts = []
    from librempeg_tpu.core.errors import EndOfStream
    while True:
        try:
            pkts.append(dmx.read_packet())
        except EndOfStream:
            break
    assert len(pkts) == 3


def test_deblock_intra():
    """In-loop deblocking on intra pictures (§8.7.2): bit-exact vs the
    reference across quadtree shapes and residual densities."""
    check(deblock=True, split_prob=0.4, nxn_prob=0.3, density=0.3,
          seed=20)
    check(deblock=True, split_prob=0.0, density=0.6, amp=20, seed=21)


def test_deblock_intra_offsets():
    """Nonzero slice beta/tc offsets change the filter thresholds."""
    check(deblock=True, density=0.4, amp=12, seed=22, beta_offset=4,
          tc_offset=2)
    check(deblock=True, density=0.4, amp=12, seed=23, beta_offset=-2,
          tc_offset=-2)


def test_deblock_qp_sweep():
    for qp in (18, 30, 42):
        check(deblock=True, density=0.4, amp=10, qp=qp, seed=24 + qp)


def test_deblock_p_frames():
    """Deblocking across P pictures: MV-delta and cbf bS=1 edges, and
    the post-deblock picture feeding the DPB."""
    check(deblock=True, p_frames=True, n_frames=4, density=0.3,
          seed=30)
    check(deblock=True, p_frames=True, n_frames=3, density=0.0,
          seed=31)


def test_sao_band_edge():
    """SAO (§8.7.3): band and edge offsets, merges, deblock off."""
    check(sao=True, seed=40)
    check(sao=True, seed=41, density=0.4, amp=10)


def test_sao_after_deblock():
    """SAO classification reads the post-deblock picture."""
    check(sao=True, deblock=True, seed=42)
    check(sao=True, deblock=True, p_frames=True, n_frames=3, seed=43)


def test_sao_luma_only():
    """slice_sao_chroma_flag off: chroma passes through."""
    check(sao=True, sao_chroma=False, seed=44)


def test_sao_ctb_sizes():
    """SAO param grid across CTB sizes (merge topology changes)."""
    for ctb in (4, 5, 6):
        check(sao=True, ctb_log2=ctb, seed=45 + ctb)


def test_multi_slice():
    """Multiple independent slice segments per picture: per-slice CABAC
    restart, slice_segment_address, prediction broken at boundaries
    (§6.4.1 availability)."""
    check(slices=2, seed=50)
    check(slices=3, seed=51, deblock=True)
    check(slices=4, seed=53, ctb_log2=4)


def test_multi_slice_sao_p():
    """SAO merge gating + inter prediction across slice boundaries."""
    check(slices=2, seed=52, sao=True, p_frames=True, n_frames=3)
    check(slices=3, seed=54, sao=True, deblock=True, p_frames=True,
          n_frames=2)
