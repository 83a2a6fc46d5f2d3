"""H.264 residual reconstruction as a Pallas TPU kernel.

Replaces the XLA scatter + dense dequant/IDCT path (device_recon.
_residuals): XLA scatter/gather cost ~300-450 ns per element on this
chip class, so scattering even 16K sparse coefficients into the dense
[nMB*27*16] tensor costs ~5-7 ms/frame, and [...,4,4]-shaped integer
butterflies use 4 of 128 VPU lanes.  This kernel reformulates the whole
residual pipeline as MXU matmuls:

* The host (native C++ packer; numpy interim) emits per-BLOCK compact
  rows: for every 4x4 block with any coded coefficient, a global block
  id (mb*24 + blk; luma 0-15 raster, chroma-u 16-19, chroma-v 20-23)
  and its 16 DEQUANTIZED coefficients in RASTER order, int16 (the spec
  bounds dequant output to 16 bits, 8.5.12.1).  Chroma-DC and
  Intra_16x16 luma-DC hadamard/dequant (8.5.10, 8.5.12.2) are folded on
  the host -- a handful of integer ops on the few coded DC rows.
* Sparse -> dense expansion is a one-hot matmul: for a stripe of 120
  MBs, onehot[120, W] = (ids_window == mb*24 + blk) contracted with the
  level rows.  Sorted ids make each stripe's entries contiguous, so a
  per-stripe scalar-prefetched window of the compact array covers them.
* The 4x4 inverse transform (8.5.12.2) is exact in f32 matmul form:
  the only nonlinearity is the >>1 on inputs of each butterfly stage,
  handled by extending the basis with floor(x/2):
      h = x @ A + floor(x/2) @ B;  v = h @ C + floor(h/2) @ D
  (A..D are 16x16 integer matrices; all values < 2^22, exact in f32).
* bf16 expansion matmuls stay exact by hi/lo splitting the residual
  (res = 256*hi + lo, both within bf16's 8-bit mantissa) and the
  per-block -> spatial placement is a 0/1 permutation matmul.

Output: per-MB spatial residual [nMB, 384] f32 (luma 16x16 row-major =
cols 0..255, chroma-u 8x8 = 256..319, chroma-v = 320..383).

Behavioral reference: /root/reference/libavcodec/h264idct_template.c
(ff_h264_idct_add), h264_mb.c dequant paths; bit-exactness asserted
against device_recon._residuals in tests/test_h264_residual_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from librempeg_tpu.codecs.h264 import device_recon as DR

MBS_PER_STRIPE = 120       # one 1080p MB row; other widths pad
WIN = 512                  # compact entries visible per stripe (bucket)


# ---------------------------------------------------------------------------
# constant matrices
# ---------------------------------------------------------------------------

def _idct_mats():
    """A, B, C, D [16,16] with h = xA + (x>>1)B ; v = hC + (h>>1)D and
    res = (v + 32) >> 6, derived from the 8.5.12.2 butterflies exactly
    as device_recon._inv4 computes them (x in raster order)."""
    A = np.zeros((16, 16), np.float32)
    B = np.zeros((16, 16), np.float32)
    C = np.zeros((16, 16), np.float32)
    D = np.zeros((16, 16), np.float32)

    def stage1(d, ds):
        # _inv4 stage 1: operates along the LAST axis (columns of the
        # row-major 4x4), producing h stacked on the last axis
        d = d.reshape(4, 4)
        ds = ds.reshape(4, 4)
        e0 = d[:, 0] + d[:, 2]
        e1 = d[:, 0] - d[:, 2]
        e2 = ds[:, 1] - d[:, 3]
        e3 = d[:, 1] + ds[:, 3]
        return np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3],
                        axis=-1).reshape(16)

    def stage2(h, hs):
        h = h.reshape(4, 4)
        hs = hs.reshape(4, 4)
        e0 = h[0, :] + h[2, :]
        e1 = h[0, :] - h[2, :]
        e2 = hs[1, :] - h[3, :]
        e3 = h[1, :] + hs[3, :]
        return np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3],
                        axis=-2).reshape(16)

    for k in range(16):
        e = np.zeros(16)
        e[k] = 1
        A[k] = stage1(e, np.zeros(16))
        B[k] = stage1(np.zeros(16), e)
        C[k] = stage2(e, np.zeros(16))
        D[k] = stage2(np.zeros(16), e)
    return A, B, C, D


def _placement_mats():
    """E[24][16, 384] 0/1: block-local raster position -> per-MB
    spatial column (luma [16,16] row-major 0..255, u 256.., v 320..)."""
    E = np.zeros((24, 16, 384), np.float32)
    for b in range(16):                       # luma raster blocks
        by, bx = b // 4, b % 4
        for p in range(16):
            r, c = p // 4, p % 4
            E[b, p, (by * 4 + r) * 16 + (bx * 4 + c)] = 1
    for pl_i, base in ((0, 256), (1, 320)):   # chroma u, v
        for b in range(4):
            by, bx = b // 2, b % 2
            for p in range(16):
                r, c = p // 4, p % 4
                E[16 + pl_i * 4 + b, p,
                  base + (by * 4 + r) * 8 + (bx * 4 + c)] = 1
    return E


_A, _B, _C, _D = _idct_mats()
_E = _placement_mats()


# ---------------------------------------------------------------------------
# host-side compact packing (numpy interim; the C++ packer mirrors this)
# ---------------------------------------------------------------------------

_IZZ = DR._IZZ                       # zigzag -> raster permutation


def pack_residual_host(coeffs: np.ndarray, qp: np.ndarray, kind,
                       chroma_qp_off: int, mb_w: int, mb_h: int):
    """coeffs [nMB,27,16] int16/32 zigzag levels (native layout), qp
    [nMB] -> (ids [K] i32 sorted, levels [K,16] i16 dequantized raster,
    offw [nstripes] i32 window starts in WIN units, ok).

    ok=False when a stripe overflows WIN entries (caller falls back).
    Mirrors what native/h264.cpp's device packer emits.
    """
    nmb = mb_w * mb_h
    co = coeffs.astype(np.int32)
    qp = qp.astype(np.int32)
    qpc = DR._CQP[np.clip(qp + chroma_qp_off, 0, 51)]
    vl = DR._VPOS[qp % 6] << (qp // 6)[:, None]          # [nMB,16] luma
    vc = DR._VPOS[qpc % 6] << (qpc // 6)[:, None]

    # dequant AC in zigzag domain (VPOS is raster; gather to raster 1st)
    lum = co[:, 1:17, :][..., _IZZ]                      # [nMB,16,16]
    lum = lum * vl[:, None, :]
    cac = co[:, 19:27, :][..., _IZZ]
    cac = cac * vc[:, None, :]

    # chroma DC (8.5.10): 2x2 hadamard, ((f*v0)<<(qpc//6))>>1
    cdc = co[:, 17:19, :4].reshape(nmb, 2, 2, 2)
    h2 = np.array([[1, 1], [1, -1]], np.int32)
    f = np.einsum("ij,npjk,kl->npil", h2, cdc, h2)
    v0c = DR._VPOS[qpc % 6][:, 0]
    cdcd = ((f * v0c[:, None, None, None]) << (qpc // 6)[:, None, None,
                                               None]) >> 1
    cac[..., 0] = cdcd.reshape(nmb, 2, 4).reshape(nmb, 8)

    # Intra_16x16 luma DC (8.5.10/8.5.12): 4x4 hadamard + scaled dequant
    is_i16 = np.asarray(kind) == 3
    if np.any(is_i16):
        h4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1],
                       [1, -1, 1, -1]], np.int32)
        dc = co[:, 0, :][:, _IZZ].reshape(nmb, 4, 4)
        fdc = np.einsum("ij,njk,kl->nil", h4, dc, h4)
        v0 = DR._VPOS[qp % 6][:, 0][:, None, None]
        hi = (fdc * v0) << np.maximum(qp // 6 - 2, 0)[:, None, None]
        lo = (fdc * v0 + (1 << np.maximum(1 - qp // 6, 0))[:, None, None]
              ) >> np.maximum(2 - qp // 6, 0)[:, None, None]
        dcd = np.where((qp >= 12)[:, None, None], hi, lo)
        lum[is_i16, :, 0] = dcd.reshape(nmb, 16)[is_i16]

    # compact per-block rows in blk24 order
    all_rows = np.concatenate(
        [lum, cac.reshape(nmb, 8, 16)], axis=1)          # [nMB,24,16]
    nz = all_rows.any(axis=2)                            # [nMB,24]
    ids = np.flatnonzero(nz).astype(np.int32)            # sorted
    levels = all_rows.reshape(-1, 16)[ids].astype(np.int16)

    nstripes = (mb_h * mb_w + MBS_PER_STRIPE - 1) // MBS_PER_STRIPE
    stripe_of = ids // (24 * MBS_PER_STRIPE)
    counts = np.bincount(stripe_of, minlength=nstripes)
    if counts.max(initial=0) > WIN:
        return None, None, False
    first = np.searchsorted(stripe_of, np.arange(nstripes))
    offw = (first // WIN).astype(np.int32)
    k = len(ids)
    cap = ((k + WIN - 1) // WIN + 2) * WIN               # + tail window
    packed = np.zeros((cap, 24), np.int16)
    packed[:, 16] = 32767                                # pad id: no match
    packed[:, 17] = 7
    packed[:k, :16] = levels
    packed[:k, 16] = (ids & 0x7FFF).astype(np.int16)
    packed[:k, 17] = (ids >> 15).astype(np.int16)
    return packed, offw, True


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _kernel(offw_ref, pkA_ref, pkB_ref, ab_ref, cd_ref, e_ref,
            e256_ref, out_ref):
    s = pl.program_id(0)
    pk = jnp.concatenate([pkA_ref[:], pkB_ref[:]], axis=0)     # [2W,24]
    lev = pk[:, :16].astype(jnp.float32)
    ids = (pk[:, 16:17].astype(jnp.int32)
           + 32768 * pk[:, 17:18].astype(jnp.int32))           # [2W,1]

    # exact 4x4 inverse transform on the compact rows
    # HIGHEST: default TPU f32 dot precision is a bf16 multi-pass that
    # is NOT exact for 16-bit integer operands
    xs = jnp.floor(lev * 0.5)
    x32 = jnp.concatenate([lev, xs], axis=1)                   # [2W,32]
    h = jnp.dot(x32, ab_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    hs = jnp.floor(h * 0.5)
    h32 = jnp.concatenate([h, hs], axis=1)
    v = jnp.dot(h32, cd_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    res = jnp.floor((v + 32.0) * (1.0 / 64.0))                 # [2W,16]

    # hi/lo split keeps the bf16 expansion matmuls exact
    hi = jnp.floor(res * (1.0 / 256.0))
    lo = res - 256.0 * hi
    hi_b = hi.astype(jnp.bfloat16)
    lo_b = lo.astype(jnp.bfloat16)

    base = (s * MBS_PER_STRIPE * 24)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, MBS_PER_STRIPE), 1)
    dn = (((0,), (0,)), ((), ()))                        # contract dim 0
    acc = jnp.zeros((MBS_PER_STRIPE, 384), jnp.float32)
    for t in range(24):
        want = base + cols * 24 + t                      # [1,120]
        onehot = (ids == want).astype(jnp.bfloat16)      # [2W,120]
        ph = jax.lax.dot_general(onehot, hi_b, dn,
                                 preferred_element_type=jnp.float32)
        pli = jax.lax.dot_general(onehot, lo_b, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(ph.astype(jnp.bfloat16),
                            e256_ref[pl.ds(16 * t, 16), :],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(pli.astype(jnp.bfloat16),
                            e_ref[pl.ds(16 * t, 16), :],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


# host-side constant operands: IDCT stages fused to [32,16] each, the
# placement stack flattened [24*16, 384]
_AB = np.concatenate([_A, _B], axis=0).astype(np.float32)
_CD = np.concatenate([_C, _D], axis=0).astype(np.float32)
_EFLAT = _E.reshape(24 * 16, 384).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("nmb",))
def expand_residual(packed, offw, nmb: int):
    """packed [K,24] i16 (cols 0-15 dequantized raster levels, 16-17 the
    split block id; K multiple of WIN with >= 2*WIN pad tail, ids
    sorted), offw [nstripes] i32 (per-stripe window start / WIN).
    Returns [nmb_pad, 384] f32 spatial residual."""
    nstripes = (nmb + MBS_PER_STRIPE - 1) // MBS_PER_STRIPE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstripes,),
        in_specs=[
            pl.BlockSpec((WIN, 24), lambda s, offw: (offw[s], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN, 24), lambda s, offw: (offw[s] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 16), lambda s, offw: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 16), lambda s, offw: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24 * 16, 384), lambda s, offw: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24 * 16, 384), lambda s, offw: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MBS_PER_STRIPE, 384),
                               lambda s, offw: (s, 0),
                               memory_space=pltpu.VMEM),
    )
    e_b = jnp.asarray(_EFLAT).astype(jnp.bfloat16)
    e256_b = jnp.asarray(_EFLAT * 256.0).astype(jnp.bfloat16)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(
            (nstripes * MBS_PER_STRIPE, 384), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(offw, packed, packed,
      jnp.asarray(_AB), jnp.asarray(_CD), e_b, e256_b)
