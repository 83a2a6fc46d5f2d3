"""Fused per-frame H.264 device decode step.

One jitted program per P frame: sparse residual scatter + Pallas MC +
residual add + intra scan + Pallas deblock + next-frame refpack/tiling,
fed by ONE packed uint8 upload. On the tunneled-TPU benchmark topology
each separate dispatch/upload costs ~1 ms of host work and wire
latency; fusing the 8-call decode sequence into a single call with a
single transfer removes most of the per-frame fixed cost (the inner
jitted functions inline -- jit-of-jit has no runtime overhead).

The packed argument buffer concatenates the frame's entropy tensors as
raw bytes; static per-bucket offsets let the program bitcast each
segment back (little-endian, same layout the host wrote)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.codecs.h264 import device_recon as DR
from librempeg_tpu.codecs.h264 import intra_pallas as IP
from librempeg_tpu.codecs.h264 import mc_pallas as MC
from librempeg_tpu.codecs.h264.deblock_pallas import deblock_frame_pallas

_FIELDS = ("idx", "vals", "qp", "kind", "info", "i4modes", "ilist",
           "selA", "selB", "mv", "ref")


def pack_args(idx, vals, qp, kind, info, i4modes, ilist, selA, selB,
              mv, ref):
    """Host side: one contiguous uint8 buffer + the static layout
    (field byte sizes in _FIELDS order)."""
    parts = [np.ascontiguousarray(a).view(np.uint8).ravel()
             for a in (idx, vals, qp, kind, info, i4modes, ilist, selA,
                       selB, mv, ref)]
    layout = tuple(p.size for p in parts)
    return np.concatenate(parts), layout


def _i32(seg):
    return jax.lax.bitcast_convert_type(seg.reshape(-1, 4), jnp.int32)


def _i16(seg):
    return jax.lax.bitcast_convert_type(seg.reshape(-1, 2), jnp.int16)


def _i8(seg):
    return jax.lax.bitcast_convert_type(seg, jnp.int8)


@functools.partial(jax.jit, static_argnames=(
    "layout", "mb_w", "mb_h", "chroma_qp_off", "icap", "nb",
    "alpha_off", "beta_off", "do_deblock", "make_ref"))
def decode_p_step(buf, lt, ct, layout, mb_w: int, mb_h: int,
                  chroma_qp_off: int, icap: int, nb: int,
                  alpha_off: int, beta_off: int, do_deblock: bool,
                  make_ref: bool):
    """buf: pack_args() buffer; lt/ct: tiled DPB refs (concatenated,
    L0 order). Returns (y, u, v, refpack, tiles); refpack/tiles are
    None unless make_ref."""
    nmb = mb_w * mb_h
    offs = np.cumsum((0,) + layout)
    segs = [buf[int(offs[i]):int(offs[i + 1])]
            for i in range(len(layout))]
    idx = _i32(segs[0])
    vals = _i16(segs[1])
    qp = _i32(segs[2])
    kind = _i32(segs[3])
    info = _i32(segs[4])
    i4modes = _i8(segs[5]).reshape(nmb, 16)
    ilist = _i32(segs[6])
    selA = _i32(segs[7])
    selB = _i32(segs[8])
    mv = _i16(segs[9]).reshape(nmb, 16, 2)
    ref = _i8(segs[10]).reshape(nmb, 4)

    py, pu, pv = MC.mc_predict(lt, ct, selA, selB, nmb, nb)
    y, u, v, lres_t, cres_t = DR.recon_p_frame_pred_noscan(
        py, pu, pv, idx, vals, qp, kind, mb_w, mb_h, chroma_qp_off,
        fold_i16=bool(icap))
    if icap:
        scal = IP.build_intra_scalars(ilist, kind, info, i4modes,
                                      mb_w, mb_h, icap)
        y, u, v = IP.intra_scan_pallas(y, u, v, scal, lres_t, cres_t,
                                       mb_w, mb_h, icap)
    if do_deblock:
        y, u, v = deblock_frame_pallas(y, u, v, idx, vals, mv, ref,
                                       qp, kind, mb_w, mb_h,
                                       chroma_qp_off, alpha_off,
                                       beta_off)
    if make_ref:
        pack = DR.make_refpack(y, u, v)
        tiles = MC.tile_refpack(*pack)
        return y, u, v, pack, tiles
    return y, u, v, None, None
