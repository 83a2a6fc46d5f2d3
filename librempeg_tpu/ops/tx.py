"""Transform library: FFT / RDFT / MDCT / DCT-II/III/IV / DST.

Behavioral analog of the reference's av_tx layer
(/root/reference/libavutil/tx.c:933 av_tx_init; codelet registry
tx_priv.h:276): one entry point hands back the right transform for a
(type, length, direction) triple.

TPU-first design, instead of the reference's runtime-assembled codelet
chains + SIMD dispatch:

* Every transform is a pure jax function over a batch: shape [..., N].
  Batch is the parallel axis (the reference's per-channel/per-frame loops
  become one fused device call).
* Two execution strategies, selected at trace time by size:
  - "matmul": the transform as a precomputed [N, N] basis matrix
    contraction. On TPU this rides the 128x128 MXU systolic array and is
    the fastest option for the short, heavily batched transforms codecs
    use (N <= ~2048: MDCT 2048/256 in AAC, DCT 8..64 in image codecs).
    Basis matrices are built once per (kind, N) and cached.
  - "fft": XLA's native FFT for long or one-off transforms where an
    O(N^2) contraction would lose to O(N log N).
* All public transforms are orthogonality/inverse-tested against numpy
  in float64 and used in float32 on device.

The un-normalized conventions match the reference (FFT unscaled, DCT-II
with factor 2, MDCT forward scaled by 1, inverse by 1/2 ... see each
function), so FATE-style golden comparisons line up.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# Above this length, FFT-based paths beat the O(N^2) MXU contraction.
_MATMUL_MAX_N = 4096


# ---------------------------------------------------------------------------
# Basis matrix construction (host, float64, cached; cast at use site)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dct2_basis(n: int) -> np.ndarray:
    """DCT-II basis: X[k] = 2 * sum_j x[j] cos(pi k (2j+1) / (2N))."""
    j = np.arange(n)
    k = np.arange(n)[:, None]
    return 2.0 * np.cos(np.pi * k * (2 * j + 1) / (2 * n))


@functools.lru_cache(maxsize=None)
def _dct3_basis(n: int) -> np.ndarray:
    """DCT-III basis: X[k] = x[0] + 2 * sum_j x[j] cos(pi j (2k+1) / (2N))."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    m = 2.0 * np.cos(np.pi * j * (2 * k + 1) / (2 * n))
    m[:, 0] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _dct4_basis(n: int) -> np.ndarray:
    """DCT-IV basis: X[k] = 2 * sum_j x[j] cos(pi (2j+1)(2k+1) / (4N))."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    return 2.0 * np.cos(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))


@functools.lru_cache(maxsize=None)
def _dst1_basis(n: int) -> np.ndarray:
    """DST-I basis: X[k] = 2 * sum_j x[j] sin(pi (j+1)(k+1) / (N+1))."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    return 2.0 * np.sin(np.pi * (j + 1) * (k + 1) / (n + 1))


@functools.lru_cache(maxsize=None)
def _mdct_fwd_basis(n: int) -> np.ndarray:
    """Forward MDCT: 2N inputs -> N outputs.

    X[k] = sum_{j=0}^{2N-1} x[j] cos(pi/N (j + 1/2 + N/2) (k + 1/2))
    """
    j = np.arange(2 * n)[None, :]
    k = np.arange(n)[:, None]
    return np.cos(np.pi / n * (j + 0.5 + n / 2) * (k + 0.5))


@functools.lru_cache(maxsize=None)
def _mdct_inv_basis(n: int) -> np.ndarray:
    """Inverse MDCT: N inputs -> 2N outputs (scaled by 2/N for perfect
    reconstruction after windowed 50% overlap-add)."""
    return _mdct_fwd_basis(n).T * (2.0 / n)


def _contract(x: jax.Array, basis: np.ndarray) -> jax.Array:
    """Apply basis matrix along the last axis: out[..., k] = sum_j x[..., j] B[k, j].

    The contraction is expressed as x @ B.T so the batch rides the MXU rows.
    """
    b = jnp.asarray(basis.T, dtype=x.dtype)
    # full-f32 MXU passes: media DSP tolerances assume true float32, and the
    # MXU's default bf16 path visibly degrades transform accuracy.
    return jnp.matmul(x, b, preferred_element_type=x.dtype,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Public transforms
# ---------------------------------------------------------------------------


def fft(x: jax.Array) -> jax.Array:
    """Complex FFT along the last axis (unscaled, like av_tx FFT)."""
    return jnp.fft.fft(x)


def ifft(x: jax.Array) -> jax.Array:
    """Unscaled inverse complex FFT (multiply-by-N convention: ifft(fft(x)) == N*x
    is NOT used; we return the scaled inverse — ifft(fft(x)) == x)."""
    return jnp.fft.ifft(x)


def rdft(x: jax.Array) -> jax.Array:
    """Real-input FFT along the last axis -> N//2+1 complex bins."""
    return jnp.fft.rfft(x)


def irdft(x: jax.Array, n: int) -> jax.Array:
    return jnp.fft.irfft(x, n=n)


def dct_ii(x: jax.Array) -> jax.Array:
    """DCT-II (the 'DCT'), unnormalized (factor 2) — matches the reference's
    AV_TX_FLOAT_DCT forward convention."""
    n = x.shape[-1]
    if n <= _MATMUL_MAX_N:
        return _contract(x, _dct2_basis(n))
    return _dct2_fft(x)


def dct_iii(x: jax.Array) -> jax.Array:
    """DCT-III (inverse DCT). dct_iii(dct_ii(x)) == 2*N*x."""
    n = x.shape[-1]
    if n <= _MATMUL_MAX_N:
        return _contract(x, _dct3_basis(n))
    return _dct3_fft(x)


def dct_iv(x: jax.Array) -> jax.Array:
    """DCT-IV, unnormalized (factor 2). Self-inverse up to 2N scale."""
    n = x.shape[-1]
    return _contract(x, _dct4_basis(n))


def dst_i(x: jax.Array) -> jax.Array:
    """DST-I, unnormalized (factor 2)."""
    n = x.shape[-1]
    return _contract(x, _dst1_basis(n))


def mdct(x: jax.Array) -> jax.Array:
    """Forward MDCT: [..., 2N] windowed samples -> [..., N] coefficients."""
    n2 = x.shape[-1]
    assert n2 % 2 == 0
    n = n2 // 2
    if n <= _MATMUL_MAX_N:
        return _contract(x, _mdct_fwd_basis(n))
    return _mdct_fft(x)


def imdct(x: jax.Array) -> jax.Array:
    """Inverse MDCT: [..., N] coefficients -> [..., 2N] time samples.

    imdct(mdct(x)) reproduces x after windowing + 50% overlap-add with a
    Princen-Bradley window (sin or KBD).
    """
    n = x.shape[-1]
    if n <= _MATMUL_MAX_N:
        return _contract(x, _mdct_inv_basis(n))
    return _imdct_fft(x)


# ---------------------------------------------------------------------------
# FFT-based long-length fallbacks
# ---------------------------------------------------------------------------


def _dct2_fft(x: jax.Array) -> jax.Array:
    """DCT-II via a 2N real FFT of the even-symmetric extension."""
    n = x.shape[-1]
    # even extension: [x0..x_{n-1}, x_{n-1}..x0]
    ext = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    spec = jnp.fft.rfft(ext)[..., :n]
    k = jnp.arange(n)
    tw = jnp.exp(-1j * jnp.pi * k / (2 * n))
    return jnp.real(spec * tw).astype(x.dtype)


def _dct3_fft(x: jax.Array) -> jax.Array:
    """DCT-III via inverse of the even-extension rFFT used by _dct2_fft.

    With our conventions dct_iii(dct_ii(x)) == 2N x, so DCT-III is 2N times
    the functional inverse of DCT-II: undo the half-sample twiddle, rebuild
    the rfft spectrum of the even extension, invert, and take the first N.
    """
    n = x.shape[-1]
    k = jnp.arange(n)
    inv_tw = jnp.exp(1j * jnp.pi * k / (2 * n))
    cdtype = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
    spec = jnp.zeros(x.shape[:-1] + (n + 1,), dtype=cdtype)
    spec = spec.at[..., :n].set(x.astype(cdtype) * inv_tw)
    ext = jnp.fft.irfft(spec, n=2 * n)
    return (2 * n * ext[..., :n]).astype(x.dtype)


def _mdct_fft(x: jax.Array) -> jax.Array:
    """MDCT via DCT-IV: fold the 2N window into N, then DCT-IV (textbook
    folding identity)."""
    n = x.shape[-1] // 2
    h = n // 2
    a, b, c, d = (x[..., :h], x[..., h:n], x[..., n:n + h], x[..., n + h:])
    folded = jnp.concatenate([-c[..., ::-1] - d, a - b[..., ::-1]], axis=-1)
    # MDCT(x)[k] = DCT-IV(folded)[k] / 2 with our factor-2 dct_iv
    return dct_iv(folded) / 2


def _imdct_fft(x: jax.Array) -> jax.Array:
    n = x.shape[-1]
    h = n // 2
    y = dct_iv(x) / n  # DCT-IV self-inverse (up to 2N); 2/N output scale
    u, v = y[..., :h], y[..., h:]
    # unfold: [v, -v_r, -u_r, -u]
    return jnp.concatenate(
        [v, -v[..., ::-1], -u[..., ::-1], -u], axis=-1
    )


# ---------------------------------------------------------------------------
# Windows (used by MDCT codecs and FIR design)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def sine_window(n: int) -> np.ndarray:
    """Princen-Bradley sine window of length n (half of a 2N MDCT frame)."""
    return np.sin(np.pi / n * (np.arange(n) + 0.5))


@functools.lru_cache(maxsize=None)
def kbd_window(n: int, alpha: float = 4.0) -> np.ndarray:
    """Kaiser-Bessel derived window (AAC uses alpha=4 long, 6 short)."""
    from librempeg_tpu.ops.firdesign import i0

    v = np.array([i0(np.pi * alpha * math.sqrt(1 - (2 * i / n - 1) ** 2))
                  for i in range(n + 1)])
    return np.sqrt(np.cumsum(v)[:n] / v.sum())
