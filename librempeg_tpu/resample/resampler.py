"""Polyphase audio resampler.

Behavioral analog of swresample's resampler
(/root/reference/libswresample/resample.c:41 build_filter — Kaiser
windowed-sinc polyphase bank; :349 multiple_resample — per-sample
phase-accumulating FIR loop; resample.h:30 ResampleContext).

TPU-first redesign ("resampling is a banded GEMM"):

For a rational rate change out/in = p/q (reduced), outputs come in
periods of p samples consuming q input samples. Output j of a period
reads a T-tap window at offset s_j with phase-j taps. Stacking the p
windows of one period over a chunk of L = q + T input samples turns the
whole period into a single [L] x [L, p] contraction; batching periods
and channels gives a [B, L] @ [L, p] GEMM that the MXU executes at full
tilt — no gather, no scalar loop. The bank matrix M (M[s_j + k, j] =
taps[j, k]) is built once per rate pair and cached.

Irrational/huge-p ratios fall back to a quantized-phase gather kernel
(the reference quantizes phases too — default 1024).

Streaming: the object keeps T-1 samples of history and an input-position
carry so arbitrary chunking is exact (same contract as swr_convert's
internal buffering).
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.core.options import Option, OptionTable, OptionedObject
from librempeg_tpu.ops.firdesign import resample_bank

_MAX_EXACT_PHASES = 1024


@functools.lru_cache(maxsize=32)
def _bank_matrix(p: int, q: int, taps: int, cutoff_x1e6: int, beta_x10: int,
                 window: str) -> tuple[np.ndarray, int, int]:
    """Dense banded bank matrix [L, p] for one period, plus (L, left_pad).

    left_pad is how many history samples the first window reaches back.
    """
    cutoff = cutoff_x1e6 / 1e6
    beta = beta_x10 / 10.0
    bank = resample_bank(taps, p, cutoff, beta, window)  # [p, taps]
    off = taps // 2 - 1 if taps > 1 else 0
    # window start for output j (relative to period origin): floor(j*q/p) - off
    starts = [(j * q) // p - off for j in range(p)]
    left_pad = -min(starts)
    L = max(starts) + taps + left_pad
    m = np.zeros((L, p), np.float32)
    for j in range(p):
        # phase: fractional part of j*q/p, taps index (j*q) % p
        phase = (j * q) % p
        s = starts[j] + left_pad
        m[s:s + taps, j] = bank[phase]
    return m, L, left_pad


@functools.partial(jax.jit, static_argnames=("q", "n_periods"))
def _resample_gemm(x: jax.Array, m: jax.Array, q: int, n_periods: int) -> jax.Array:
    """x: [C, left_pad + n_periods*q + tail] padded input;
    m: [L, p] bank matrix. Returns [C, n_periods * p]."""
    C = x.shape[0]
    L, p = m.shape
    # overlapping chunks: chunk i = x[:, i*q : i*q + L]
    idx = (jnp.arange(n_periods) * q)[:, None] + jnp.arange(L)[None, :]
    chunks = x[:, idx]                      # [C, n_periods, L]
    out = jnp.einsum("cnl,lp->cnp", chunks, m,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(C, n_periods * p)


class Resampler(OptionedObject):
    """Streaming rational resampler over [channels, samples] float32."""

    OPTIONS = OptionTable(
        Option("filter_size", int, 32, min=4, max=512,
               help="taps per phase (swr filter_size analog)"),
        Option("cutoff", float, 0.0, min=0.0, max=1.0,
               help="anti-alias cutoff relative to min(in,out) Nyquist; 0=auto"),
        Option("kaiser_beta", float, 9.0, min=2.0, max=16.0),
        Option("window", str, "kaiser", choices=["kaiser", "blackman_nuttall"]),
    )

    def __init__(self, in_rate: int, out_rate: int, channels: int = 2, **opts):
        super().__init__(**opts)
        if in_rate <= 0 or out_rate <= 0:
            raise ValueError("rates must be positive")
        self.in_rate = in_rate
        self.out_rate = out_rate
        self.channels = channels
        g = math.gcd(in_rate, out_rate)
        self.p = out_rate // g
        self.q = in_rate // g
        if self.p > _MAX_EXACT_PHASES:
            # quantize phases: approximate ratio with p' <= max phases
            # (the reference uses a fixed phase_count with linear interp;
            # we pick the closest rational with bounded denominator)
            from fractions import Fraction

            f = Fraction(out_rate, in_rate).limit_denominator(_MAX_EXACT_PHASES)
            # NOTE: this changes effective ratio by <1e-6; exactness callers
            # should keep p <= 1024 (all standard rate pairs do)
            self.p, self.q = f.numerator, f.denominator
        cutoff = self.opts["cutoff"]
        if cutoff == 0.0:
            # auto: swr uses 0.97 of the output Nyquist when downsampling
            cutoff = 0.971 * min(1.0, self.p / self.q)
        taps = self.opts["filter_size"]
        if self.p < self.q:
            # keep absolute transition width when downsampling: more taps
            taps = int(math.ceil(taps * self.q / self.p / 2)) * 2
        self._m_np, self.L, self.left_pad = _bank_matrix(
            self.p, self.q, taps, int(cutoff * 1e6),
            int(self.opts["kaiser_beta"] * 10), self.opts["window"])
        self.taps = taps
        self._m = jnp.asarray(self._m_np)
        # streaming state: unconsumed input tail (includes history)
        self._hist = np.zeros((channels, self.left_pad), np.float32)
        self._out_count = 0  # total outputs produced

    # -- core ---------------------------------------------------------
    def process(self, samples: np.ndarray | jax.Array, final: bool = False
                ) -> np.ndarray:
        """Push [channels, n] samples; returns resampled [channels, m].

        With final=True, flushes the tail (zero-padded history drain).
        """
        samples = np.asarray(samples, np.float32)
        self._total_in = getattr(self, "_total_in", 0) + samples.shape[1]
        x = np.concatenate([self._hist, samples], axis=1)

        if final:
            # exact total output length: ceil(total_in * p / q)
            want_total = -(-self._total_in * self.p // self.q)
            need_periods = max(0, -(-(want_total - self._out_count) // self.p))
            # zero-pad so every needed window is computable
            need_len = (need_periods - 1) * self.q + self.L if need_periods else 0
            pad = max(0, need_len - x.shape[1])
            if pad:
                x = np.concatenate(
                    [x, np.zeros((self.channels, pad), np.float32)], axis=1)
            n_periods = need_periods
        else:
            # periods fully computable from real data:
            # need i*q + L <= avail  for i = 0..n_periods-1
            n_periods = max(0, (x.shape[1] - self.L) // self.q + 1)

        if n_periods == 0:
            self._hist = x
            return np.zeros((self.channels, 0), np.float32)
        out = np.asarray(_resample_gemm(jnp.asarray(x), self._m, self.q, n_periods))
        self._hist = x[:, n_periods * self.q:]
        self._out_count += n_periods * self.p
        if final and self._out_count > want_total:
            out = out[:, : out.shape[1] - (self._out_count - want_total)]
            self._out_count = want_total
        return out

    def flush(self) -> np.ndarray:
        return self.process(np.zeros((self.channels, 0), np.float32), final=True)

    @property
    def delay(self) -> int:
        """Pending input samples not yet represented in output."""
        return self._hist.shape[1] - self.left_pad
