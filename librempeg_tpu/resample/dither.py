"""Dither and noise shaping for float -> integer PCM output.

Behavioral analog of libswresample's dither stage
(/root/reference/libswresample/dither.c:1 swri_get_dither /
swri_dither_init; options.c `dither_method`): additive dither in LSBs
before requantization, optionally with an error-feedback noise shaper
that pushes quantization noise out of the ear's sensitive band.

Methods:
- "rectangular": uniform in [-0.5, 0.5) LSB.
- "triangular":  TPDF, sum of two uniforms (the safe default).
- "triangular_hp": high-passed TPDF (first difference of uniform
  noise), concentrating dither power at high frequencies.
- "lipshitz": TPDF dither + 5-tap error-feedback noise shaper with the
  Lipshitz/Vanderkooy/Wannamaker minimally audible coefficients for
  44.1 kHz (published in JAES 39(11), 1991 — the same constants the
  reference's filter_lipshitz table encodes).
- "f_weighted": 3-tap Wannamaker f-weighted shaper, same family.

The error-feedback loop (quantize -> feed error through an FIR back
into the next sample) is inherently sequential per sample, so it runs
as a `lax.scan` over time, vectorized across channels — a TPU/CPU jit
program instead of the reference's per-sample C loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Ditherer", "DITHER_METHODS"]

# error-feedback FIR coefficients (error history, most recent first)
_SHAPER_COEFS = {
    # Lipshitz et al. 1991, minimally audible 5-tap @44.1k
    "lipshitz": [2.033, -2.165, 1.959, -1.590, 0.6149],
    # Wannamaker f-weighted 3-tap
    "f_weighted": [1.623, -0.982, 0.109],
}

DITHER_METHODS = ("none", "rectangular", "triangular", "triangular_hp",
                  "lipshitz", "f_weighted")


@jax.jit
def _shape_scan(x, noise, coefs, err0):
    """Error-feedback requantization: for each sample
        y = round(x - sum(c_k * e_{n-k}) + dither)
        e = y - (x - sum(c_k * e_{n-k}))
    x/noise: [C, N] in LSB units; err0 [K, C] carried history.
    Returns (quantized [C, N] floats, final err history)."""

    def step(err_hist, inp):
        xi, di = inp                       # [C], [C]
        fb = jnp.einsum("kc,k->c", err_hist, coefs)
        want = xi - fb
        y = jnp.round(want + di)
        e = y - want
        err_hist = jnp.concatenate([e[None, :], err_hist[:-1]], axis=0)
        return err_hist, y

    hist, ys = jax.lax.scan(step, err0, (x.T, noise.T))
    return ys.T, hist


class Ditherer:
    """Stateful per-stream ditherer (float [-1,1) -> integer arrays).

    State (RNG + error history continuity) persists across chunks so
    streamed output is identical to one-shot.
    """

    def __init__(self, method: str = "triangular", seed: int = 0):
        if method not in DITHER_METHODS:
            raise ValueError(f"unknown dither method {method!r}")
        self.method = method
        self._seed = seed
        self._pos = 0                      # absolute samples consumed
        self._hp_last = None               # per-channel carry for _hp
        self._err = None                   # shaper error-history carry

    def _uniforms(self, C: int, N: int, per: int) -> np.ndarray:
        """[N, C, per] uniforms in [0,1), indexed by ABSOLUTE sample
        position (counter-based Philox), so chunked streaming draws the
        same values as one-shot."""
        skip = self._pos * C * per
        bg = np.random.Philox(key=self._seed)
        # Philox.advance counts 4-word COUNTER blocks (one block = 4
        # float64 draws), so advance whole blocks and burn the rest
        bg.advance(skip // 4)
        g = np.random.Generator(bg)
        if skip % 4:
            g.random(skip % 4)
        return g.random((N, C, per))

    def _noise(self, shape) -> np.ndarray:
        C, N = shape
        m = self.method
        if m == "rectangular":
            u = self._uniforms(C, N, 1)
            return (u[:, :, 0].T - 0.5).astype(np.float32)
        if m == "triangular_hp":
            # first difference of uniform noise: TPDF density, 6 dB/oct
            # high-pass spectrum (reference dither.c triangular_hp)
            u = self._uniforms(C, N, 1)[:, :, 0].T - 0.5
            prev = (self._hp_last if self._hp_last is not None
                    else np.zeros(C))
            self._hp_last = u[:, -1].copy() if N else prev
            shifted = np.concatenate([prev[:, None], u[:, :-1]], axis=1)
            return (u - shifted).astype(np.float32)
        # TPDF for triangular and both noise shapers
        u = self._uniforms(C, N, 2)
        return (u[:, :, 0] - u[:, :, 1]).T.astype(np.float32)

    def apply(self, x: np.ndarray, out_fmt: str) -> np.ndarray:
        """x: float32 [C, N] in [-1, 1) -> integer array in out_fmt."""
        base = out_fmt.rstrip("p")
        scale, lo, hi, dt = {
            "u8": (128.0, 0, 255, np.uint8),
            "s16": (32768.0, -32768, 32767, np.int16),
            "s32": (2147483648.0, -2 ** 31, 2 ** 31 - 1, np.int64),
        }[base]
        off = 128.0 if base == "u8" else 0.0
        xl = x.astype(np.float32) * scale + off    # LSB units
        if self.method == "none":
            y = np.rint(xl)
        elif self.method in _SHAPER_COEFS:
            cs = _SHAPER_COEFS[self.method]
            coefs = jnp.asarray(cs, jnp.float32)
            if self._err is None or self._err.shape[1] != xl.shape[0]:
                self._err = jnp.zeros((len(cs), xl.shape[0]),
                                      jnp.float32)
            yj, self._err = _shape_scan(
                jnp.asarray(xl), jnp.asarray(self._noise(xl.shape)),
                coefs, self._err)
            y = np.asarray(yj)
        else:
            y = np.rint(xl + self._noise(xl.shape))
        self._pos += xl.shape[1]
        out = np.clip(y, lo, hi).astype(dt)
        return out.astype(np.int32) if base == "s32" else out
