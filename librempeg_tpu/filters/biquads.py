"""IIR biquad audio filters: lowpass/highpass/bandpass/bandreject/
allpass/equalizer/bass/treble/biquad.

Analog of /root/reference/libavfilter/af_biquads.c (RBJ Audio-EQ-Cookbook
coefficient formulas, direct-form-II-transposed evaluation). TPU-first:
the recurrence runs as a jitted `lax.scan` over samples with the (z1,z2)
state carried across frames, all channels advancing in lockstep on the
VPU — the XLA shape of the reference's per-channel C loops.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.core.options import Option, OptionTable
from librempeg_tpu.codecs.pcm import from_float, to_float
from librempeg_tpu.filters.filter import (
    Filter,
    PadDesc,
    register_filter,
)


@jax.jit
def _df2t_scan(b, a, x, z):
    """x [C, N] float32, z [C, 2]; returns (y [C, N], z')."""

    def step(z, xn):
        z1, z2 = z[:, 0], z[:, 1]
        out = b[0] * xn + z1
        z1n = b[1] * xn - a[0] * out + z2
        z2n = b[2] * xn - a[1] * out
        return jnp.stack([z1n, z2n], axis=-1), out

    z, y = jax.lax.scan(step, z, x.T)
    return y.T, z


class _BiquadBase(Filter):
    INPUTS = (PadDesc("default", "audio"),)
    OUTPUTS = (PadDesc("default", "audio"),)

    def configure(self, in_props):
        self.in_props = in_props
        self.out_props = [in_props[0].copy()]
        self._z = None
        self._ba = None
        return self.out_props

    def _coeffs(self, sample_rate: int):
        raise NotImplementedError

    def filter_frame(self, frame, pad=0):
        if self._ba is None:
            b, a = self._coeffs(frame.sample_rate)
            a0 = a[0]
            self._ba = (jnp.asarray([c / a0 for c in b], jnp.float32),
                        jnp.asarray([a[1] / a0, a[2] / a0], jnp.float32))
        x = to_float(np.asarray(frame.data), frame.sample_fmt)
        if self._z is None:
            self._z = jnp.zeros((x.shape[0], 2), jnp.float32)
        y, self._z = _df2t_scan(self._ba[0], self._ba[1],
                                jnp.asarray(x, jnp.float32), self._z)
        y = from_float(np.asarray(y), frame.sample_fmt)
        return [(0, frame.replace(data=y))]


def _rbj(kind: str, f: float, sr: int, q: float, gain_db: float = 0.0):
    w0 = 2.0 * math.pi * f / sr
    cw, sw = math.cos(w0), math.sin(w0)
    alpha = sw / (2.0 * q)
    A = 10.0 ** (gain_db / 40.0)
    if kind == "lowpass":
        b = [(1 - cw) / 2, 1 - cw, (1 - cw) / 2]
        a = [1 + alpha, -2 * cw, 1 - alpha]
    elif kind == "highpass":
        b = [(1 + cw) / 2, -(1 + cw), (1 + cw) / 2]
        a = [1 + alpha, -2 * cw, 1 - alpha]
    elif kind == "bandpass":
        b = [alpha, 0.0, -alpha]
        a = [1 + alpha, -2 * cw, 1 - alpha]
    elif kind == "bandreject":
        b = [1.0, -2 * cw, 1.0]
        a = [1 + alpha, -2 * cw, 1 - alpha]
    elif kind == "allpass":
        b = [1 - alpha, -2 * cw, 1 + alpha]
        a = [1 + alpha, -2 * cw, 1 - alpha]
    elif kind == "equalizer":
        b = [1 + alpha * A, -2 * cw, 1 - alpha * A]
        a = [1 + alpha / A, -2 * cw, 1 - alpha / A]
    elif kind == "bass":                      # low shelf
        sq = 2.0 * math.sqrt(A) * alpha
        b = [A * ((A + 1) - (A - 1) * cw + sq),
             2 * A * ((A - 1) - (A + 1) * cw),
             A * ((A + 1) - (A - 1) * cw - sq)]
        a = [(A + 1) + (A - 1) * cw + sq,
             -2 * ((A - 1) + (A + 1) * cw),
             (A + 1) + (A - 1) * cw - sq]
    elif kind == "treble":                    # high shelf
        sq = 2.0 * math.sqrt(A) * alpha
        b = [A * ((A + 1) + (A - 1) * cw + sq),
             -2 * A * ((A - 1) + (A + 1) * cw),
             A * ((A + 1) + (A - 1) * cw - sq)]
        a = [(A + 1) - (A - 1) * cw + sq,
             2 * ((A - 1) - (A + 1) * cw),
             (A + 1) - (A - 1) * cw - sq]
    else:
        raise ValueError(kind)
    return b, a


def _make_rbj_filter(name: str, default_f: float, has_gain: bool,
                     description: str):
    opts = [Option("frequency", float, default_f, alias="f",
                   min=0.1, max=999999.0),
            Option("width", float, 0.707, alias="w", min=0.01, max=1000.0)]
    order = ["frequency", "width"]
    if has_gain:
        opts.append(Option("gain", float, 0.0, alias="g",
                           min=-900.0, max=900.0))
        order = ["frequency", "gain", "width"]

    class _F(_BiquadBase):
        NAME = name
        DESCRIPTION = description
        OPTIONS = OptionTable(*opts)
        OPT_ORDER = tuple(order)

        def _coeffs(self, sr):
            return _rbj(name, self.opts["frequency"], sr,
                        self.opts["width"],
                        self.opts["gain"] if has_gain else 0.0)

    _F.__name__ = f"{name.capitalize()}Filter"
    return register_filter(_F)


LowpassFilter = _make_rbj_filter(
    "lowpass", 500.0, False, "Apply a low-pass filter (2nd-order RBJ).")
HighpassFilter = _make_rbj_filter(
    "highpass", 3000.0, False, "Apply a high-pass filter (2nd-order RBJ).")
BandpassFilter = _make_rbj_filter(
    "bandpass", 3000.0, False, "Apply a band-pass filter (0 dB peak).")
BandrejectFilter = _make_rbj_filter(
    "bandreject", 3000.0, False, "Apply a band-reject (notch) filter.")
AllpassFilter = _make_rbj_filter(
    "allpass", 3000.0, False, "Apply a 2nd-order all-pass filter.")
EqualizerFilter = _make_rbj_filter(
    "equalizer", 1000.0, True, "Apply a peaking equalizer band.")
BassFilter = _make_rbj_filter(
    "bass", 100.0, True, "Boost or cut lower frequencies (low shelf).")
TrebleFilter = _make_rbj_filter(
    "treble", 3000.0, True, "Boost or cut upper frequencies (high shelf).")


@register_filter
class BiquadFilter(_BiquadBase):
    NAME = "biquad"
    DESCRIPTION = "Apply a biquad IIR with user coefficients."
    OPTIONS = OptionTable(
        Option("b0", float, 1.0, min=-1e9, max=1e9),
        Option("b1", float, 0.0, min=-1e9, max=1e9),
        Option("b2", float, 0.0, min=-1e9, max=1e9),
        Option("a0", float, 1.0, min=-1e9, max=1e9),
        Option("a1", float, 0.0, min=-1e9, max=1e9),
        Option("a2", float, 0.0, min=-1e9, max=1e9),
    )

    def _coeffs(self, sr):
        o = self.opts
        return ([o["b0"], o["b1"], o["b2"]], [o["a0"], o["a1"], o["a2"]])
