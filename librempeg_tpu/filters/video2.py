"""More video filters: blurs, point ops, deinterlace, drawing.

Analogs of vf_gblur.c, vf_boxblur.c, vf_eq.c (lutyuv class),
vf_drawbox.c, vf_bwdif/yadif (the 'send_frame' non-temporal mode),
vf_negate/vf_lut class ops — all pure device transforms.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.core.eval_expr import eval_expr
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.options import Option, OptionTable
from librempeg_tpu.filters.filter import Filter, register_filter


def _apply_planes(frame: VideoFrame, fn, luma_only=False):
    planes = []
    for i, p in enumerate(frame.planes):
        if luma_only and i > 0:
            planes.append(p)
            continue
        x = jnp.asarray(p).astype(jnp.float32)
        y = fn(x, i)
        planes.append(jnp.clip(jnp.floor(y + 0.5), 0, 255).astype(jnp.uint8))
    return frame.replace(planes=tuple(planes))


@register_filter
class GBlurFilter(Filter):
    NAME = "gblur"
    DESCRIPTION = "Apply Gaussian blur."
    PURE = True
    OPT_ORDER = ("sigma",)
    OPTIONS = OptionTable(
        Option("sigma", float, 0.5, min=0.0, max=1024.0),
        Option("steps", int, 1, min=1, max=6),
    )

    def filter_frame(self, frame, pad=0):
        sigma = self.opts["sigma"]
        if sigma <= 0:
            return [(0, frame)]
        radius = max(1, int(math.ceil(sigma * 3)))
        xs = np.arange(-radius, radius + 1)
        k = np.exp(-xs ** 2 / (2 * sigma * sigma)).astype(np.float32)
        k /= k.sum()
        kj = jnp.asarray(k)

        def blur(x, i):
            xp = jnp.pad(x, ((radius, radius), (radius, radius)),
                         mode="edge")
            # separable: rows then cols via correlation
            x1 = sum(kj[t] * xp[:, t:t + x.shape[1]]
                     for t in range(2 * radius + 1))
            x2 = sum(kj[t] * x1[t:t + x.shape[0], :]
                     for t in range(2 * radius + 1))
            return x2

        return [(0, _apply_planes(frame, blur))]


@register_filter
class BoxBlurFilter(Filter):
    NAME = "boxblur"
    DESCRIPTION = "Blur the input with a box kernel."
    PURE = True
    OPT_ORDER = ("luma_radius",)
    OPTIONS = OptionTable(
        Option("luma_radius", str, "2", alias="lr"),
    )

    def filter_frame(self, frame, pad=0):
        r = int(eval_expr(str(self.opts["luma_radius"]),
                          {"w": frame.width, "h": frame.height}))
        if r <= 0:
            return [(0, frame)]

        def blur(x, i):
            xp = jnp.pad(x, ((r, r), (r, r)), mode="edge")
            c = jnp.cumsum(jnp.cumsum(jnp.pad(xp, ((1, 0), (1, 0))), axis=0),
                           axis=1)
            n = 2 * r + 1
            h, w = x.shape
            s = (c[n:n + h, n:n + w] - c[:h, n:n + w]
                 - c[n:n + h, :w] + c[:h, :w])
            return s / (n * n)

        return [(0, _apply_planes(frame, blur))]


@register_filter
class EqFilter(Filter):
    NAME = "eq"
    DESCRIPTION = "Adjust brightness, contrast, saturation."
    PURE = True
    OPTIONS = OptionTable(
        Option("contrast", float, 1.0, min=-1000.0, max=1000.0),
        Option("brightness", float, 0.0, min=-1.0, max=1.0),
        Option("saturation", float, 1.0, min=0.0, max=3.0),
    )

    def filter_frame(self, frame, pad=0):
        c = self.opts["contrast"]
        b = self.opts["brightness"] * 255.0
        s = self.opts["saturation"]

        def fn(x, i):
            if i == 0:
                return (x - 128.0) * c + 128.0 + b
            return (x - 128.0) * s + 128.0

        return [(0, _apply_planes(frame, fn))]


@register_filter
class NegateFilter(Filter):
    NAME = "negate"
    DESCRIPTION = "Negate input video."
    PURE = True

    def filter_frame(self, frame, pad=0):
        return [(0, _apply_planes(frame, lambda x, i: 255.0 - x))]


@register_filter
class DrawBoxFilter(Filter):
    NAME = "drawbox"
    DESCRIPTION = "Draw a colored box on the input."
    OPT_ORDER = ("x", "y", "width", "height", "color", "thickness")
    OPTIONS = OptionTable(
        Option("x", str, "0"),
        Option("y", str, "0"),
        Option("width", str, "0", alias="w"),
        Option("height", str, "0", alias="h"),
        Option("color", str, "black", alias="c"),
        Option("thickness", int, 3, alias="t", min=1, max=64),
    )

    def filter_frame(self, frame, pad=0):
        v = {"iw": frame.width, "ih": frame.height, "in_w": frame.width,
             "in_h": frame.height}
        x0 = int(eval_expr(str(self.opts["x"]), v))
        y0 = int(eval_expr(str(self.opts["y"]), v))
        w = int(eval_expr(str(self.opts["width"]), v)) or frame.width
        h = int(eval_expr(str(self.opts["height"]), v)) or frame.height
        t = self.opts["thickness"]
        from librempeg_tpu.filters.video import _parse_color

        fill = _parse_color(self.opts["color"], frame.format)
        d = frame.desc
        planes = []
        for i, p in enumerate(frame.planes):
            sx = d.planes[i].log2_chroma_w
            sy = d.planes[i].log2_chroma_h
            px, py = x0 >> sx, y0 >> sy
            pw, ph = w >> sx, h >> sy
            pt = max(1, t >> sx)
            arr = jnp.asarray(p)
            yy = jnp.arange(arr.shape[0])[:, None]
            xx = jnp.arange(arr.shape[1])[None, :]
            inside = ((yy >= py) & (yy < py + ph)
                      & (xx >= px) & (xx < px + pw))
            interior = ((yy >= py + pt) & (yy < py + ph - pt)
                        & (xx >= px + pt) & (xx < px + pw - pt))
            border = inside & ~interior
            val = fill[i] if i < len(fill) else 0
            planes.append(jnp.where(border, jnp.uint8(val), arr))
        return [(0, frame.replace(planes=tuple(planes)))]


@register_filter
class DeinterlaceFilter(Filter):
    NAME = "yadif"
    DESCRIPTION = "Deinterlace (spatial check, send_frame mode)."
    PURE = True
    OPTIONS = OptionTable(
        Option("mode", int, 0, min=0, max=3),
    )

    def filter_frame(self, frame, pad=0):
        if not frame.interlaced:
            return [(0, frame)]

        def deint(x, i):
            # keep top field, spatially interpolate bottom-field lines
            up = jnp.roll(x, 1, axis=0)
            down = jnp.roll(x, -1, axis=0)
            interp = (up + down) * 0.5
            rows = jnp.arange(x.shape[0])[:, None]
            return jnp.where(rows % 2 == 1, interp, x)

        out = _apply_planes(frame, deint)
        return [(0, out.replace(interlaced=False))]


@register_filter
class LutYuvFilter(Filter):
    NAME = "lutyuv"
    DESCRIPTION = "Apply expressions to YUV components."
    OPTIONS = OptionTable(
        Option("y", str, "val"),
        Option("u", str, "val"),
        Option("v", str, "val"),
    )

    def filter_frame(self, frame, pad=0):
        # build 256-entry LUTs from the expressions once per frame
        tables = []
        for key in ("y", "u", "v"):
            expr = self.opts[key]
            lut = np.array([
                np.clip(eval_expr(expr, {"val": t, "maxval": 255,
                                         "minval": 0}), 0, 255)
                for t in range(256)], np.uint8)
            tables.append(jnp.asarray(lut))

        planes = []
        for i, p in enumerate(frame.planes):
            t = tables[min(i, 2)]
            planes.append(t[jnp.asarray(p)])
        return [(0, frame.replace(planes=tuple(planes)))]
