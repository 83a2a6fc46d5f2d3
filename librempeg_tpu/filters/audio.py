"""Audio filters.

Analogs of the reference's af_* family: anull, aformat (af_aformat.c),
aresample (af_aresample.c wrapping swresample), volume (af_volume.c),
atrim (f_trim.c), amix (af_amix.c).
"""
from __future__ import annotations

import numpy as np

from librempeg_tpu.codecs.pcm import from_float, to_float
from librempeg_tpu.core.errors import InvalidData
from librempeg_tpu.core.frame import AudioFrame
from librempeg_tpu.core.options import Option, OptionTable
from librempeg_tpu.core.rational import NOPTS, Rational
from librempeg_tpu.core.samplefmt import ChannelLayout
from librempeg_tpu.filters.filter import (
    Filter,
    PadDesc,
    StreamProps,
    register_filter,
)
from librempeg_tpu.resample import Swr


@register_filter
class ANullFilter(Filter):
    NAME = "anull"
    DESCRIPTION = "Pass the audio source unchanged."
    PURE = True
    INPUTS = (PadDesc("default", "audio"),)
    OUTPUTS = (PadDesc("default", "audio"),)


@register_filter
class AFormatFilter(Filter):
    NAME = "aformat"
    DESCRIPTION = "Convert audio to the specified formats."
    INPUTS = (PadDesc("default", "audio"),)
    OUTPUTS = (PadDesc("default", "audio"),)
    OPTIONS = OptionTable(
        Option("sample_fmts", str, "", alias="f"),
        Option("sample_rates", str, "", alias="r"),
        Option("channel_layouts", str, "", alias="cl"),
    )

    def configure(self, in_props):
        self.in_props = in_props
        out = in_props[0].copy()
        if self.opts["sample_fmts"]:
            out.sample_fmt = self.opts["sample_fmts"].split("|")[0]
        if self.opts["sample_rates"]:
            out.sample_rate = int(self.opts["sample_rates"].split("|")[0])
        if self.opts["channel_layouts"]:
            out.layout = ChannelLayout.from_string(
                self.opts["channel_layouts"].split("|")[0])
        self.out_props = [out]
        self._swr = None
        p = in_props[0]
        if (out.sample_rate != p.sample_rate or out.sample_fmt != p.sample_fmt
                or (out.layout and p.layout
                    and out.layout.nb_channels != p.layout.nb_channels)):
            self._swr = Swr(p.sample_rate, out.sample_rate,
                            in_layout=p.layout or 2,
                            out_layout=out.layout or p.layout or 2,
                            in_fmt=p.sample_fmt or "fltp",
                            out_fmt=out.sample_fmt or "fltp")
        return self.out_props

    def filter_frame(self, frame: AudioFrame, pad=0):
        if self._swr is None:
            return [(0, frame)]
        return [(0, self._swr.convert_frame(frame))]

    def flush(self):
        if self._swr is None:
            return []
        f = self._swr.flush_frame()
        return [(0, f)] if f.nb_samples else []


@register_filter
class AResampleFilter(Filter):
    NAME = "aresample"
    DESCRIPTION = "Resample audio data."
    INPUTS = (PadDesc("default", "audio"),)
    OUTPUTS = (PadDesc("default", "audio"),)
    OPT_ORDER = ("sample_rate",)
    OPTIONS = OptionTable(
        Option("sample_rate", int, 0, min=0, max=768000),
        Option("filter_size", int, 32, min=4, max=512),
        Option("cutoff", float, 0.0, min=0.0, max=1.0),
    )

    def configure(self, in_props):
        self.in_props = in_props
        p = in_props[0]
        out = p.copy()
        rate = self.opts["sample_rate"] or p.sample_rate
        out.sample_rate = rate
        out.time_base = Rational(1, rate)
        self.out_props = [out]
        self._swr = None
        if rate != p.sample_rate:
            self._swr = Swr(p.sample_rate, rate, in_layout=p.layout or 2,
                            in_fmt=p.sample_fmt or "fltp",
                            out_fmt=p.sample_fmt or "fltp",
                            filter_size=self.opts["filter_size"],
                            cutoff=self.opts["cutoff"])
        return self.out_props

    def filter_frame(self, frame: AudioFrame, pad=0):
        if self._swr is None:
            return [(0, frame)]
        return [(0, self._swr.convert_frame(frame))]

    def flush(self):
        if self._swr is None:
            return []
        f = self._swr.flush_frame()
        return [(0, f)] if f.nb_samples else []


@register_filter
class VolumeFilter(Filter):
    NAME = "volume"
    DESCRIPTION = "Change input volume."
    PURE = True
    INPUTS = (PadDesc("default", "audio"),)
    OUTPUTS = (PadDesc("default", "audio"),)
    OPT_ORDER = ("volume",)
    OPTIONS = OptionTable(Option("volume", str, "1.0"))

    def configure(self, in_props):
        self.in_props = in_props
        self.out_props = [in_props[0].copy()]
        vol = str(self.opts["volume"])
        if vol.endswith("dB"):
            self._gain = 10 ** (float(vol[:-2]) / 20)
        else:
            from librempeg_tpu.core.eval_expr import eval_expr

            self._gain = float(eval_expr(vol))
        return self.out_props

    def filter_frame(self, frame: AudioFrame, pad=0):
        x = to_float(np.asarray(frame.data), frame.sample_fmt)
        y = from_float(x * self._gain, frame.sample_fmt)
        return [(0, frame.replace(data=y))]


@register_filter
class ATrimFilter(Filter):
    NAME = "atrim"
    DESCRIPTION = "Pick one continuous section from the audio input."
    INPUTS = (PadDesc("default", "audio"),)
    OUTPUTS = (PadDesc("default", "audio"),)
    OPTIONS = OptionTable(
        Option("start", float, 0.0),
        Option("end", float, float("inf")),
    )

    def configure(self, in_props):
        self.in_props = in_props
        self.out_props = [in_props[0].copy()]
        return self.out_props

    def filter_frame(self, frame: AudioFrame, pad=0):
        rate = frame.sample_rate
        s0 = int(self.opts["start"] * rate)
        s1 = (int(self.opts["end"] * rate)
              if self.opts["end"] != float("inf") else 1 << 62)
        pts = frame.pts if frame.pts != NOPTS else 0
        f_start, f_end = pts, pts + frame.nb_samples
        lo = max(s0, f_start)
        hi = min(s1, f_end)
        if lo >= hi:
            return []
        if lo == f_start and hi == f_end:
            return [(0, frame)]
        data = np.asarray(frame.data)[:, lo - f_start:hi - f_start]
        return [(0, frame.replace(data=data, pts=lo))]


@register_filter
class AMixFilter(Filter):
    NAME = "amix"
    DESCRIPTION = "Mix several audio streams."
    INPUTS = (PadDesc("in0", "audio"), PadDesc("in1", "audio"))
    OUTPUTS = (PadDesc("default", "audio"),)
    OPTIONS = OptionTable(
        Option("inputs", int, 2, min=2, max=32),
        Option("normalize", bool, True),
    )

    def __init__(self, args: str = "", **kwargs):
        super().__init__(args, **kwargs)
        n = self.opts["inputs"]
        self.INPUTS = tuple(PadDesc(f"in{i}", "audio") for i in range(n))
        self._bufs = [np.zeros((0, 0), np.float32) for _ in range(n)]
        self._nch = 0

    def configure(self, in_props):
        self.in_props = in_props
        self.out_props = [in_props[0].copy()]
        return self.out_props

    def filter_frame(self, frame: AudioFrame, pad=0):
        x = to_float(np.asarray(frame.data), frame.sample_fmt)
        if self._bufs[pad].shape[0] == 0:
            self._bufs[pad] = x
        else:
            self._bufs[pad] = np.concatenate([self._bufs[pad], x], axis=1)
        self._fmt = frame.sample_fmt
        self._rate = frame.sample_rate
        self._layout = frame.layout
        n = min(b.shape[1] for b in self._bufs if b.size) \
            if all(b.size for b in self._bufs) else 0
        if n == 0:
            return []
        mix = sum(b[:, :n] for b in self._bufs)
        if self.opts["normalize"]:
            mix = mix / len(self._bufs)
        self._bufs = [b[:, n:] for b in self._bufs]
        pts = getattr(self, "_next_pts", 0)
        self._next_pts = pts + n
        return [(0, AudioFrame(data=from_float(mix, self._fmt),
                               sample_rate=self._rate, sample_fmt=self._fmt,
                               layout=self._layout, pts=pts))]

    def flush(self):
        lens = [b.shape[1] for b in self._bufs if b.size]
        if not lens:
            return []
        n = max(lens)
        acc = np.zeros((self._bufs[0].shape[0] or 2, n), np.float32)
        cnt = 0
        for b in self._bufs:
            if b.size:
                acc[:, :b.shape[1]] += b
                cnt += 1
        if self.opts["normalize"] and cnt:
            acc /= len(self._bufs)
        self._bufs = [np.zeros((0, 0), np.float32) for _ in self._bufs]
        pts = getattr(self, "_next_pts", 0)
        self._next_pts = pts + n
        return [(0, AudioFrame(data=from_float(acc, self._fmt),
                               sample_rate=self._rate, sample_fmt=self._fmt,
                               layout=self._layout, pts=pts))]
