"""On-device H.264 P-frame reconstruction + deblocking: bit-exact vs
the host (native/h264.cpp) path, which is itself validated bit-exact
against the reference decoder in test_h264_inter.py."""
import numpy as np
import pytest

from librempeg_tpu.native import build as native

if not native.available():
    pytest.skip("native extension unavailable", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from librempeg_tpu.codecs.h264 import device_recon as D  # noqa: E402
from librempeg_tpu.codecs.h264 import parse as P  # noqa: E402
from librempeg_tpu.codecs.h264 import recon as R  # noqa: E402
from librempeg_tpu.codecs.h264.codec import H264Encoder  # noqa: E402
from librempeg_tpu.core.frame import VideoFrame  # noqa: E402
from librempeg_tpu.core.rational import Rational  # noqa: E402


def _stream(w, h, n, qp=26):
    """Encode a smooth-motion clip (keeps P frames all-inter)."""
    rng = np.random.default_rng(11)
    gy, gx = np.mgrid[0:h * 2, 0:w * 2]
    base = np.clip(128 + 60 * np.sin(gx / 23.0) * np.cos(gy / 17.0)
                   + rng.normal(0, 2, (h * 2, w * 2)), 0,
                   255).astype(np.uint8)
    frames = []
    for i in range(n):
        y = base[i:h + i, i * 2:w + i * 2]
        u = base[i // 2:h // 2 + i // 2, i:w // 2 + i]
        v = base[i // 2 + 4:h // 2 + i // 2 + 4, i + 2:w // 2 + i + 2]
        frames.append(VideoFrame(planes=(y.copy(), u.copy(), v.copy()),
                                 format="yuv420p", width=w, height=h,
                                 pts=i, time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=qp, g=n)  # one I, rest P
    return enc, [enc.encode(f)[0] for f in frames]


def _entropy(pkt, sps, pps):
    for raw in P.split_annexb(bytes(pkt.data)):
        nal = P.NalUnit.parse(raw)
        if nal.type in (1, 5):
            sh = P.parse_slice_header(nal.rbsp, sps, pps, nal.type,
                                      nal.ref_idc)
            res = native.h264_decode_slice_cavlc(
                nal.rbsp, sh.data_bit_pos, sps.pic_width_in_mbs,
                sps.pic_height_in_map_units, sh.first_mb,
                0 if sh.slice_type == "P" else 2, sh.qp,
                sh.num_ref_idx_l0)
            return sh, res
    return None, None


def _sparse(res):
    flat = res["coeffs"].astype(np.int32).ravel()
    idx = np.flatnonzero(flat).astype(np.int32)
    return jnp.asarray(idx), jnp.asarray(flat[idx].astype(np.int16))


@pytest.mark.slow
def test_device_recon_and_deblock_match_host():
    w, h = 96, 64
    mb_w, mb_h = w // 16, h // 16
    enc, pkts = _stream(w, h, 6)
    sps = P.parse_sps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[0]).rbsp)
    pps = P.parse_pps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[1]).rbsp)

    # host-decode frame 0 (IDR) for the reference DPB
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    dec = H264Decoder(enc.codec_parameters())
    f0 = dec.decode(pkts[0])[0]
    ref_host = tuple(np.ascontiguousarray(p) for p in f0.planes)

    n_inter = 0
    for pkt in pkts[1:]:
        sh, res = _entropy(pkt, sps, pps)
        assert res is not None and res["last_mb"] == mb_w * mb_h
        if np.any(res["kind"] >= 2):
            continue                        # intra-in-P: host path
        n_inter += 1

        # host recon + deblock
        pack = R.RefPack(*ref_host)
        yh, uh, vh = R.reconstruct_frame_native(res, mb_w, mb_h, 0,
                                                [pack])
        yh = np.ascontiguousarray(yh)
        uh = np.ascontiguousarray(uh)
        vh = np.ascontiguousarray(vh)
        ydb, udb, vdb = yh.copy(), uh.copy(), vh.copy()
        native.h264_deblock_frame(ydb, udb, vdb, res["kind"], res["qp"],
                                  res["mv"], res["ref"], res["ncoef"],
                                  mb_w, mb_h)

        # device recon + deblock from the same entropy tensors
        luma4, up, vp = D.make_refpack(jnp.asarray(ref_host[0]),
                                       jnp.asarray(ref_host[1]),
                                       jnp.asarray(ref_host[2]))
        # device refpack planes must equal the host RefPack
        assert np.array_equal(np.asarray(luma4[0]), pack.E)
        assert np.array_equal(np.asarray(luma4[1]), pack.B)
        assert np.array_equal(np.asarray(luma4[2]), pack.Hm)
        assert np.array_equal(np.asarray(luma4[3]), pack.J)
        idx, vals = _sparse(res)
        kind = jnp.asarray(res["kind"])
        none_list = jnp.asarray(np.full(1, -1, np.int32))
        yd, ud, vd = D.recon_p_frame(
            luma4[None], up[None], vp[None], idx, vals,
            jnp.asarray(res["mv"]), jnp.asarray(res["ref"]),
            jnp.asarray(res["qp"]), kind, jnp.asarray(res["info"]),
            jnp.asarray(res["i4modes"]), none_list, mb_w, mb_h, 0, 0)
        assert np.array_equal(np.asarray(yd), yh), "luma recon"
        assert np.array_equal(np.asarray(ud), uh), "u recon"
        assert np.array_equal(np.asarray(vd), vh), "v recon"

        ydd, udd, vdd = D.deblock_frame(
            yd, ud, vd, idx, vals, jnp.asarray(res["mv"]),
            jnp.asarray(res["ref"]), jnp.asarray(res["qp"]), kind,
            mb_w, mb_h)
        assert np.array_equal(np.asarray(ydd), ydb), "luma deblock"
        assert np.array_equal(np.asarray(udd), udb), "u deblock"
        assert np.array_equal(np.asarray(vdd), vdb), "v deblock"

        ref_host = (ydb, udb, vdb)
    assert n_inter >= 3, "test stream produced too few all-inter frames"


def test_decoder_device_mode_bit_exact():
    """H264Decoder(device=1) == H264Decoder(device=0) on mixed streams
    (IDR + P with occasional intra-in-P -> exercises the host fallback
    and DPB handoff in both directions)."""
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 96, 64
    enc, pkts = _stream(w, h, 8)
    d_dev = H264Decoder(enc.codec_parameters(), device=1)
    d_host = H264Decoder(enc.codec_parameters(), device=0)
    for pkt in pkts:
        fd = d_dev.decode(pkt)
        fh = d_host.decode(pkt)
        assert len(fd) == len(fh)
        for a, b in zip(fd, fh):
            for pa, pb in zip(a.planes, b.planes):
                assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_decoder_device_mode_variety_torture():
    """Device mode on variety streams (all MB shapes incl. I_4x4 and
    I_16x16 intra-in-P -> exercises the device intra scan and bS 3/4
    strong deblocking; IDR frames route to the host path). Outputs stay
    bit-exact vs the host decoder."""
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 80, 48
    rng = np.random.default_rng(5)
    frames = []
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.uint8)
    for i in range(8):
        y = base[i:h + i, i * 2:w + i * 2]
        u = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y.copy(), u, v),
                                 format="yuv420p", width=w, height=h,
                                 pts=i, time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=30, g=4, variety=1)
    pkts = [enc.encode(f)[0] for f in frames]
    d_dev = H264Decoder(enc.codec_parameters(), device=1)
    d_host = H264Decoder(enc.codec_parameters(), device=0)
    for pkt in pkts:
        for a, b in zip(d_dev.decode(pkt), d_host.decode(pkt)):
            for pa, pb in zip(a.planes, b.planes):
                assert np.array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.slow
def test_decoder_device_mode_intra_heavy():
    """P frames with DENSE intra-in-P (scene-change band refreshed with
    fresh noise every frame -> runs of adjacent intra MBs incl. frame
    edges): the device intra scan must handle neighbor chains where an
    intra MB's left/top/top-right neighbors are themselves intra."""
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 96, 64
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.uint8)
    frames = []
    for i in range(6):
        y = base[i:h + i, i * 2:w + i * 2].copy()
        # top band + a center block get uncorrelated noise each frame:
        # motion search fails there and the encoder falls back to intra
        y[:16, :] = rng.integers(0, 256, (16, w))
        y[32:64, 32:80] = rng.integers(0, 256, (32, 48))
        u = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                 width=w, height=h, pts=i,
                                 time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=28, g=6)
    pkts = [enc.encode(f)[0] for f in frames]

    # sanity: the stream really has P frames with many intra MBs
    sps = P.parse_sps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[0]).rbsp)
    pps = P.parse_pps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[1]).rbsp)
    max_intra = 0
    for pkt in pkts[1:]:
        sh, res = _entropy(pkt, sps, pps)
        if sh.slice_type == "P":
            max_intra = max(max_intra,
                            int(np.count_nonzero(res["kind"] >= 2)))
    assert max_intra >= 6, f"want dense intra-in-P, got {max_intra}"

    d_dev = H264Decoder(enc.codec_parameters(), device=1)
    d_host = H264Decoder(enc.codec_parameters(), device=0)
    for pkt in pkts:
        for a, b in zip(d_dev.decode(pkt), d_host.decode(pkt)):
            for pa, pb in zip(a.planes, b.planes):
                assert np.array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.slow
def test_pallas_deblock_interpret_bit_exact():
    """The Pallas deblock kernel (deblock_pallas.py), run in interpret
    mode on CPU, matches the native C++ deblock bit-exactly -- incl.
    intra bS 3/4 strong filtering (frames with intra-in-P kept)."""
    from librempeg_tpu.codecs.h264.deblock_pallas import (
        deblock_frame_pallas,
    )
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 96, 64
    mb_w, mb_h = w // 16, h // 16
    enc, pkts = _stream(w, h, 5)
    sps = P.parse_sps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[0]).rbsp)
    pps = P.parse_pps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[1]).rbsp)
    dec = H264Decoder(enc.codec_parameters())
    ref_host = tuple(np.ascontiguousarray(p)
                     for p in dec.decode(pkts[0])[0].planes)
    n = 0
    for pkt in pkts[1:]:
        sh, res = _entropy(pkt, sps, pps)
        pack = R.RefPack(*ref_host)
        yh, uh, vh = (np.ascontiguousarray(x) for x in
                      R.reconstruct_frame_native(res, mb_w, mb_h, 0,
                                                 [pack]))
        ydb, udb, vdb = yh.copy(), uh.copy(), vh.copy()
        native.h264_deblock_frame(ydb, udb, vdb, res["kind"], res["qp"],
                                  res["mv"], res["ref"], res["ncoef"],
                                  mb_w, mb_h)
        idx, vals = _sparse(res)
        yp, up, vp = deblock_frame_pallas(
            jnp.asarray(yh), jnp.asarray(uh), jnp.asarray(vh), idx,
            vals, jnp.asarray(res["mv"]), jnp.asarray(res["ref"]),
            jnp.asarray(res["qp"]), jnp.asarray(res["kind"]),
            mb_w, mb_h, interpret=True)
        assert np.array_equal(np.asarray(yp), ydb), "luma"
        assert np.array_equal(np.asarray(up), udb), "u"
        assert np.array_equal(np.asarray(vp), vdb), "v"
        ref_host = (ydb, udb, vdb)
        n += 1
    assert n >= 4


@pytest.mark.slow
def test_pallas_mc_and_pred_recon_bit_exact():
    """The Pallas MC path (mc_pallas.mc_predict windowed DMA, interpret
    mode) + recon_p_frame_pred matches recon_p_frame (XLA gather MC)
    bit-exactly, tiers A and B, on real stream data."""
    from librempeg_tpu.codecs.h264 import mc_pallas as M
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 96, 64
    mb_w, mb_h = w // 16, h // 16
    nmb = mb_w * mb_h
    enc, pkts = _stream(w, h, 5)
    sps = P.parse_sps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[0]).rbsp)
    pps = P.parse_pps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[1]).rbsp)
    dec = H264Decoder(enc.codec_parameters())
    ref_host = tuple(np.ascontiguousarray(np.asarray(p))
                     for p in dec.decode(pkts[0])[0].planes)
    n = 0
    for pkt in pkts[1:]:
        sh, res = _entropy(pkt, sps, pps)
        luma4, up, vp = D.make_refpack(*[jnp.asarray(p)
                                         for p in ref_host])
        idx, vals = _sparse(res)
        kind = jnp.asarray(res["kind"])
        intra = np.flatnonzero(res["kind"] >= 2).astype(np.int32)
        icap = max(len(intra), 0)
        ilist = np.full(max(icap, 1), -1, np.int32)
        ilist[:len(intra)] = intra
        args = (jnp.asarray(res["qp"]), kind, jnp.asarray(res["info"]),
                jnp.asarray(res["i4modes"]), jnp.asarray(ilist))
        y0, u0, v0 = D.recon_p_frame(
            luma4[None], up[None], vp[None], idx, vals,
            jnp.asarray(res["mv"]), jnp.asarray(res["ref"]), *args,
            mb_w, mb_h, 0, icap)

        lt, ct = M.tile_refpack(luma4, up, vp)
        selA, selB = M.build_selectors(res, mb_w, mb_h, luma4.shape[1],
                                       luma4.shape[2], up.shape[0],
                                       up.shape[1])
        nb = max(len(selB) // 16, 1)
        sb = np.zeros((nb * 16, 6), np.int32)
        sb[:] = selA[0]
        sb[:, 5] = nmb << 4
        sb[:len(selB)] = selB
        py, pu, pv = M.mc_predict(lt, ct, jnp.asarray(selA),
                                  jnp.asarray(sb), nmb, nb,
                                  interpret=True)
        y1, u1, v1 = D.recon_p_frame_pred(py, pu, pv, idx, vals, *args,
                                          mb_w, mb_h, 0, icap)
        assert np.array_equal(np.asarray(y0), np.asarray(y1)), "luma"
        assert np.array_equal(np.asarray(u0), np.asarray(u1)), "u"
        assert np.array_equal(np.asarray(v0), np.asarray(v1)), "v"
        fs = dec.decode(pkt)
        if fs:
            ref_host = tuple(np.ascontiguousarray(np.asarray(p))
                             for p in fs[-1].planes)
        n += 1
    assert n >= 4


@pytest.mark.slow
def test_pallas_intra_scan_bit_exact():
    """The Pallas intra kernel (intra_pallas.intra_scan_pallas,
    interpret mode) matches the XLA lax.scan intra pass bit-exactly on
    dense intra-in-P frames (adjacent intra chains, I_4x4 + I_16x16,
    frame edges)."""
    from librempeg_tpu.codecs.h264 import mc_pallas as M
    from librempeg_tpu.codecs.h264.codec import H264Decoder
    from librempeg_tpu.codecs.h264.intra_pallas import (
        build_intra_scalars, intra_scan_pallas)

    w, h = 96, 64
    mb_w, mb_h = w // 16, h // 16
    nmb = mb_w * mb_h
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.uint8)
    frames = []
    for i in range(5):
        y = base[i:h + i, i * 2:w + i * 2].copy()
        y[:16, :] = rng.integers(0, 256, (16, w))
        y[32:64, 32:80] = rng.integers(0, 256, (32, 48))
        u = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 166, (h // 2, w // 2)).astype(np.uint8)
        frames.append(VideoFrame(planes=(y, u, v), format="yuv420p",
                                 width=w, height=h, pts=i,
                                 time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=28, g=5, variety=1)
    pkts = [enc.encode(f)[0] for f in frames]
    sps = P.parse_sps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[0]).rbsp)
    pps = P.parse_pps(P.NalUnit.parse(
        list(P.split_annexb(bytes(pkts[0].data)))[1]).rbsp)
    dec = H264Decoder(enc.codec_parameters())
    ref_host = tuple(np.ascontiguousarray(np.asarray(p))
                     for p in dec.decode(pkts[0])[0].planes)
    n = 0
    for pkt in pkts[1:]:
        sh, res = _entropy(pkt, sps, pps)
        intra = np.flatnonzero(res["kind"] >= 2).astype(np.int32)
        if len(intra):
            icap = len(intra) + 3          # incl. -1 padding rows
            ilist = np.full(icap, -1, np.int32)
            ilist[:len(intra)] = intra
            luma4, up, vp = D.make_refpack(*[jnp.asarray(p)
                                             for p in ref_host])
            idx, vals = _sparse(res)
            kind = jnp.asarray(res["kind"])
            args = (jnp.asarray(res["qp"]), kind,
                    jnp.asarray(res["info"]),
                    jnp.asarray(res["i4modes"]), jnp.asarray(ilist))
            y0, u0, v0 = D.recon_p_frame(
                luma4[None], up[None], vp[None], idx, vals,
                jnp.asarray(res["mv"]), jnp.asarray(res["ref"]), *args,
                mb_w, mb_h, 0, icap)
            lt, ct = M.tile_refpack(luma4, up, vp)
            selA, selB = M.build_selectors(
                res, mb_w, mb_h, luma4.shape[1], luma4.shape[2],
                up.shape[0], up.shape[1])
            nb = max(len(selB) // 16, 1)
            sb = np.zeros((nb * 16, 6), np.int32)
            sb[:] = selA[0]
            sb[:, 5] = nmb << 4
            sb[:len(selB)] = selB
            py, pu, pv = M.mc_predict(lt, ct, jnp.asarray(selA),
                                      jnp.asarray(sb), nmb, nb,
                                      interpret=True)
            y1, u1, v1, lres_t, cres_t = D.recon_p_frame_pred_noscan(
                py, pu, pv, idx, vals, jnp.asarray(res["qp"]), kind,
                mb_w, mb_h, 0, True)
            scal = build_intra_scalars(
                jnp.asarray(ilist), kind, jnp.asarray(res["info"]),
                jnp.asarray(res["i4modes"]), mb_w, mb_h, icap)
            y2, u2, v2 = intra_scan_pallas(y1, u1, v1, scal, lres_t,
                                           cres_t, mb_w, mb_h, icap,
                                           interpret=True)
            assert np.array_equal(np.asarray(y0), np.asarray(y2))
            assert np.array_equal(np.asarray(u0), np.asarray(u2))
            assert np.array_equal(np.asarray(v0), np.asarray(v2))
            n += 1
        fs = dec.decode(pkt)
        if fs:
            ref_host = tuple(np.ascontiguousarray(np.asarray(p))
                             for p in fs[-1].planes)
    assert n >= 2, "test stream produced too few intra-in-P frames"


def test_decode_ahead_worker_bit_exact():
    """prefetch=2 (decode-ahead entropy worker) produces the same frame
    sequence as the synchronous decoder -- mixed IDR/P stream with
    intra-in-P, frames delayed by the pipeline depth but identical in
    content and order after flush."""
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 96, 64
    enc, pkts = _stream(w, h, 8)
    d_pf = H264Decoder(enc.codec_parameters(), device=1, prefetch=2)
    d_sync = H264Decoder(enc.codec_parameters(), device=1)
    got, want = [], []
    for pkt in pkts:
        got.extend(d_pf.decode(pkt))
        want.extend(d_sync.decode(pkt))
    got.extend(d_pf.flush())
    want.extend(d_sync.flush())
    assert len(got) == len(want) == len(pkts)
    for a, b in zip(got, want):
        assert a.pts == b.pts
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_decode_ahead_worker_bframes():
    """Decode-ahead with B frames (reorder queue downstream of the
    worker) and in-band SPS/PPS stays bit-exact and ordered."""
    from librempeg_tpu.codecs.h264.codec import H264Decoder

    w, h = 96, 64
    rng = np.random.default_rng(11)
    gy, gx = np.mgrid[0:h * 2, 0:w * 2]
    base = np.clip(128 + 60 * np.sin(gx / 23.0) * np.cos(gy / 17.0)
                   + rng.normal(0, 2, (h * 2, w * 2)), 0,
                   255).astype(np.uint8)
    frames = []
    for i in range(9):
        y = base[i:h + i, i * 2:w + i * 2]
        u = base[i // 2:h // 2 + i // 2, i:w // 2 + i]
        v = base[i // 2 + 4:h // 2 + i // 2 + 4, i + 2:w // 2 + i + 2]
        frames.append(VideoFrame(planes=(y.copy(), u.copy(), v.copy()),
                                 format="yuv420p", width=w, height=h,
                                 pts=i, time_base=Rational(1, 25)))
    enc = H264Encoder(width=w, height=h, qp=26, g=9, bf=1)
    pkts = [p for f in frames for p in enc.encode(f)] + enc.flush()
    d_pf = H264Decoder(enc.codec_parameters(), device=0, prefetch=3)
    d_sync = H264Decoder(enc.codec_parameters(), device=0)
    got, want = [], []
    for pkt in pkts:
        got.extend(d_pf.decode(pkt))
        want.extend(d_sync.decode(pkt))
    got.extend(d_pf.flush())
    want.extend(d_sync.flush())
    assert len(got) == len(want) == len(frames)
    for a, b in zip(got, want):
        for pa, pb in zip(a.planes, b.planes):
            assert np.array_equal(np.asarray(pa), np.asarray(pb))
