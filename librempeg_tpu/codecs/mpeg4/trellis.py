"""Rate-distortion (trellis) quantization for the MPEG-4/H.263 coder.

Chooses quantized levels per 8x8 block that minimize
``distortion + lambda * bits`` where bits are the exact run/level/last
VLC lengths (escape events cost the fixed 30-bit type-3 form the
packer emits).  Mirrors the behavior of the reference trellis
quantizer (mpegvideo_enc.c:3923 dct_quantize_trellis_c): candidate
levels {L, L-1} (or +/-1 below the quantization threshold), exact
bit costs, squared error in ISO-DCT coefficient space, and an
optimal choice of the final coded coefficient.  The lattice itself
(dense vectorized Viterbi over all blocks) lives in ops/trellis.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.ops.trellis import viterbi_rl

from . import tables as T

_ESC_BITS = 30          # escape type 3: 7+2+1+6+1+12+1


@functools.lru_cache(maxsize=None)
def _bits_tables(intra: bool):
    """(bits_notlast, bits_last) int32 arrays [64 runs, 64 levels];
    level index 0 is unused, absent events cost the 30-bit escape."""
    idx = T.INTRA_RL_INDEX if intra else T.INTER_RL_INDEX
    b0 = np.full((64, 64), _ESC_BITS, np.int32)
    b1 = np.full((64, 64), _ESC_BITS, np.int32)
    for (last, run, alevel), (_, bits) in idx.items():
        if alevel < 64:
            (b1 if last else b0)[run, alevel] = bits + 1   # +sign bit
    return b0, b1


def _dequant_mag(alevel, qscale):
    """H.263 dequant magnitude for alevel >= 1 (ISO coefficient units,
    mpeg4videodec `(2*level+1)*qscale - (qscale&1 ? 0 : 1)`)."""
    even = 1 - (qscale & 1)
    return (2 * alevel + 1) * qscale - even


def quantize_rd(zz: jax.Array, qscale, intra: bool, first: int):
    """RD-quantize zigzag-ordered DCT coefficients.

    zz      [nblk, 64] float ISO-DCT coefficients in zigzag order
    qscale  traced int scalar
    intra   static: selects the RL table (DC at zz[0] is ignored when
            first == 1 and must be handled by the caller)
    first   static: first AC position (1 intra, 0 inter)

    Returns int32 [nblk, 64] levels (positions < first are zero).
    """
    qscale = jnp.asarray(qscale, jnp.int32)
    qf = qscale.astype(jnp.float32)
    # reference lambda (mpegvideo_enc.c:3947): lambda2 >> (SHIFT-6)
    # with distortion in (8*ISO)^2 units; our distortion is ISO^2 so
    # divide by 64:   (118*q)^2 / 128 / 2 / 64  ~=  0.85 * q^2
    lam = 0.85 * qf * qf

    b0_tab, b1_tab = _bits_tables(intra)
    mag = jnp.abs(zz)
    l0 = jnp.trunc(mag / (2.0 * qf)).astype(jnp.int32)
    l0 = jnp.clip(l0, 0, 2047)
    # candidates: {L, L-1} when L>=2, {1} when L<=1 (coding a below-
    # threshold coefficient as +/-1 is allowed when RD-favorable)
    cands = jnp.stack([jnp.maximum(l0, 1), jnp.maximum(l0 - 1, 1)],
                      axis=-1)                          # [nblk,64,2]
    dqm = _dequant_mag(cands, qscale).astype(jnp.float32)
    dist_c = (dqm - mag[..., None]) ** 2                # [nblk,64,2]
    bidx = jnp.minimum(cands, 63)                       # escape past 63
    return viterbi_rl(zz, cands, dist_c, bidx,
                      jnp.asarray(b0_tab, jnp.float32),
                      jnp.asarray(b1_tab, jnp.float32), lam, first)
