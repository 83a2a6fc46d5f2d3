"""8x8 block DCT/IDCT cores for image/video codecs.

Analog of the reference's fdctdsp/idctdsp function-pointer tables
(/root/reference/libavcodec/fdctdsp.c, idctdsp.c:314, and the fixed-point
"simple idct" family) re-designed for TPU:

* Blocks are always batched: inputs are [B, 8, 8] (B = all blocks of all
  planes of all frames in flight). A separable 8x8 transform is two tiny
  matrix contractions; with B in the thousands the MXU runs them as
  [B*8, 8] x [8, 8] GEMMs at full tilt — the TPU replacement for the
  per-block SIMD loops of the reference.
* Float path: orthonormal DCT-II/III basis — used by encoders and by
  decode paths gated on PSNR tolerance.
* Integer path `idct_int`: a fixed-point IDCT with the same numeric
  contract as the reference's simple_idct 8-bit profile (constants
  W_i = round(2^14 * sqrt(2) * cos(i*pi/16)) with W4 forced to 16383,
  row shift 11, column shift 20, column rounder folded into the DC term
  as (1<<19)//W4). Because each pass is linear with a single final
  arithmetic shift, the whole pass is expressible as one integer matmul
  + shift — bit-exact AND MXU/VPU-friendly. Int32 wraparound matches C.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Float orthonormal path
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ortho_basis() -> np.ndarray:
    """8x8 orthonormal DCT-II basis C: C @ x gives 1D DCT, C.T inverse."""
    c = np.zeros((8, 8))
    for k in range(8):
        for j in range(8):
            c[k, j] = np.cos(np.pi * k * (2 * j + 1) / 16)
    c *= np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c


def fdct(blocks: jax.Array) -> jax.Array:
    """Forward orthonormal 8x8 DCT over [..., 8, 8] blocks (float)."""
    c = jnp.asarray(_ortho_basis(), dtype=blocks.dtype)
    return jnp.einsum("ij,...jk,lk->...il", c, blocks, c,
                      preferred_element_type=blocks.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def idct(coeffs: jax.Array) -> jax.Array:
    """Inverse orthonormal 8x8 DCT over [..., 8, 8] blocks (float)."""
    c = jnp.asarray(_ortho_basis(), dtype=coeffs.dtype)
    return jnp.einsum("ji,...jk,kl->...il", c, coeffs, c,
                      preferred_element_type=coeffs.dtype,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Integer fixed-point path (simple_idct 8-bit numeric contract)
# ---------------------------------------------------------------------------

ROW_SHIFT = 11
COL_SHIFT = 20

_W = [0,
      22725,  # round(2^14 * sqrt(2) * cos(1*pi/16))
      21407,  # round(2^14 * sqrt(2) * cos(2*pi/16))
      19266,  # round(2^14 * sqrt(2) * cos(3*pi/16))
      16383,  # 2^14 * sqrt(2) * cos(4*pi/16) = 16384, held at 16383 for headroom
      12873,  # round(2^14 * sqrt(2) * cos(5*pi/16))
      8867,   # round(2^14 * sqrt(2) * cos(6*pi/16))
      4520]   # round(2^14 * sqrt(2) * cos(7*pi/16))


@functools.lru_cache(maxsize=None)
def _int_idct_matrix() -> np.ndarray:
    """The 8x8 integer matrix M with out = M @ in for one IDCT pass
    (before rounding/shift). Rows follow the even/odd butterfly:

      even a_j from in[0,2,4,6], odd b_j from in[1,3,5,7]
      out[j] = a_j + b_j, out[7-j] = a_j - b_j  (j = 0..3)
    """
    W = _W
    a = np.zeros((4, 8), np.int64)
    b = np.zeros((4, 8), np.int64)
    # even part
    a[0, 0], a[0, 2], a[0, 4], a[0, 6] = W[4], W[2], W[4], W[6]
    a[1, 0], a[1, 2], a[1, 4], a[1, 6] = W[4], W[6], -W[4], -W[2]
    a[2, 0], a[2, 2], a[2, 4], a[2, 6] = W[4], -W[6], -W[4], W[2]
    a[3, 0], a[3, 2], a[3, 4], a[3, 6] = W[4], -W[2], W[4], -W[6]
    # odd part
    b[0, 1], b[0, 3], b[0, 5], b[0, 7] = W[1], W[3], W[5], W[7]
    b[1, 1], b[1, 3], b[1, 5], b[1, 7] = W[3], -W[7], -W[1], -W[5]
    b[2, 1], b[2, 3], b[2, 5], b[2, 7] = W[5], -W[1], W[7], W[3]
    b[3, 1], b[3, 3], b[3, 5], b[3, 7] = W[7], -W[5], W[3], -W[1]
    m = np.zeros((8, 8), np.int64)
    for j in range(4):
        m[j] = a[j] + b[j]
        m[7 - j] = a[j] - b[j]
    return m.astype(np.int32)


def idct_int(coeffs: jax.Array) -> jax.Array:
    """Fixed-point 8x8 IDCT over [..., 8, 8] int32 blocks -> int32 spatial.

    Numeric contract of the reference's simple_idct (8-bit template):
    row pass rounder 1<<10 then >>11; column pass folds its rounder into
    the DC coefficient as (1<<19)//W4 = 32, then >>20. Output is the
    un-clamped residual; callers add prediction and clamp.
    """
    m = jnp.asarray(_int_idct_matrix())
    x = coeffs.astype(jnp.int32)
    # row pass: transform along the last axis
    rows = jnp.einsum("kj,...ij->...ik", m, x, preferred_element_type=jnp.int32)
    rows = (rows + (1 << (ROW_SHIFT - 1))) >> ROW_SHIFT
    # column pass: fold rounder into DC of each column, transform along rows
    dc_round = (1 << (COL_SHIFT - 1)) // _W[4]
    rows = rows.at[..., 0, :].add(dc_round)
    cols = jnp.einsum("ki,...ij->...kj", m, rows, preferred_element_type=jnp.int32)
    return cols >> COL_SHIFT


def idct_int_put(coeffs: jax.Array) -> jax.Array:
    """IDCT + clamp to uint8 (idct_put semantics for intra blocks)."""
    return jnp.clip(idct_int(coeffs), 0, 255).astype(jnp.uint8)


def idct_int_add(coeffs: jax.Array, pred: jax.Array) -> jax.Array:
    """IDCT + add prediction + clamp (idct_add semantics for inter blocks)."""
    r = idct_int(coeffs) + pred.astype(jnp.int32)
    return jnp.clip(r, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Block (de)tiling helpers
# ---------------------------------------------------------------------------


def to_blocks(plane: jax.Array) -> jax.Array:
    """[..., H, W] -> [..., H//8 * W//8, 8, 8] row-major block order."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 8, 8, w // 8, 8)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, (h // 8) * (w // 8), 8, 8)


def from_blocks(blocks: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of to_blocks."""
    *lead, _, _, _ = blocks.shape
    x = blocks.reshape(*lead, h // 8, w // 8, 8, 8)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, h, w)
