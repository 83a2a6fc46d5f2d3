"""Video scaling / pixel format conversion engine.

Analog of libswscale's frame API + graph engine
(/root/reference/libswscale/swscale.c:1380 sws_scale_frame; graph.c:971
ff_sws_graph_run; and the new SwsOp compiler ops.c — whose "decompose ->
optimize -> fuse" design this module realizes the XLA way: the whole
conversion plan is traced into ONE jitted device program per
(src, dst, kernel) signature, and XLA fuses unpack/FIR/matrix/pack into
a minimal number of passes).

Plan shape:
  unpack: uint planes -> float32 working tensors (0..255 scale domain)
  chroma align: upsample to 4:4:4 when a colorspace/range change needs it
  convert: 3x3 matrix + offsets (ops/colorspace)
  resize: separable polyphase GEMM (ops/fir) per plane
  repack: round, clamp, cast, re-subsample chroma

All functions accept leading batch dimensions ([N, H, W] planes) — the
data-parallel axis that replaces swscale's slice threading.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.core import pixfmt as pf
from librempeg_tpu.core.errors import Unsupported
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.ops import colorspace as cs
from librempeg_tpu.ops.fir import resize_matrix, resize_plane
from librempeg_tpu.ops.firdesign import SCALER_KERNEL_NAMES


def _is_yuv(d: pf.PixFmtDesc) -> bool:
    return not d.is_rgb


def _max_val(d: pf.PixFmtDesc) -> float:
    return float((1 << d.bit_depth) - 1)


def _round_store(x: jax.Array, d: pf.PixFmtDesc) -> jax.Array:
    mx = _max_val(d)
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, mx)
    if d.bit_depth <= 8:
        return x.astype(jnp.uint8)
    if d.is_float:
        return x.astype(jnp.float32)
    return x.astype(jnp.uint16)


def _load_scaled(x: jax.Array, d: pf.PixFmtDesc) -> jax.Array:
    """To float32 in the 0..255 working domain regardless of bit depth."""
    x = x.astype(jnp.float32)
    if d.bit_depth != 8 and not d.is_float:
        x = x * (255.0 / _max_val(d))
    return x


def _store_domain(x: jax.Array, d: pf.PixFmtDesc) -> jax.Array:
    if d.bit_depth != 8 and not d.is_float:
        x = x * (_max_val(d) / 255.0)
    return x


@dataclass(frozen=True)
class ScalerSpec:
    src_fmt: str
    src_w: int
    src_h: int
    dst_fmt: str
    dst_w: int
    dst_h: int
    kernel: str = "bicubic"
    csp: str = "bt601"
    src_full: bool | None = None   # None = format default
    dst_full: bool | None = None


class Scaler:
    """Compiled scaling/conversion plan for one (src, dst) signature."""

    def __init__(self, src_fmt: str, src_w: int, src_h: int,
                 dst_fmt: str, dst_w: int, dst_h: int,
                 kernel: str = "bicubic", csp: str = "bt601",
                 src_full: bool | None = None, dst_full: bool | None = None):
        if kernel not in SCALER_KERNEL_NAMES:
            raise Unsupported(f"unknown scaler kernel {kernel!r}")
        self.spec = ScalerSpec(src_fmt, src_w, src_h, dst_fmt, dst_w, dst_h,
                               kernel, csp, src_full, dst_full)
        self.src_desc = pf.get(src_fmt)
        self.dst_desc = pf.get(dst_fmt)
        sd, dd = self.src_desc, self.dst_desc
        self._src_full = (src_full if src_full is not None
                          else sd.default_range == pf.ColorRange.JPEG)
        self._dst_full = (dst_full if dst_full is not None
                          else dd.default_range == pf.ColorRange.JPEG)
        self._fn = jax.jit(self._plan)

    # -- plan ---------------------------------------------------------
    def _to_rgb444(self, planes) -> jax.Array:
        """Input planes -> [..., H, W, 3] float RGB (0..255)."""
        sd = self.spec
        d = self.src_desc
        if d.is_rgb:
            rgb = self._unpack_rgb(planes, d)
            return rgb
        y, u, v = self._yuv_planes_444(planes)
        return cs.yuv_to_rgb(y, u, v, self.spec.csp, self._src_full)

    def _unpack_rgb(self, planes, d: pf.PixFmtDesc) -> jax.Array:
        if d.nb_planes == 1:
            x = _load_scaled(planes[0], d)  # [..., H, W, C]
            comps = d.planes[0].components
            order = [comps.index(c) for c in ("r", "g", "b")]
            return x[..., order]
        # planar RGB (gbrp): planes in g,b,r order
        names = [p.components[0] for p in d.planes]
        g = _load_scaled(planes[names.index("g")], d)
        b = _load_scaled(planes[names.index("b")], d)
        r = _load_scaled(planes[names.index("r")], d)
        return jnp.stack([r, g, b], axis=-1)

    def _yuv_planes_444(self, planes):
        """Upsample chroma to luma resolution (float)."""
        d = self.src_desc
        y = _load_scaled(planes[0], d)
        if d.nb_planes == 1:  # gray
            zeros = jnp.full_like(y, 128.0)
            return y, zeros, zeros
        h, w = self.spec.src_h, self.spec.src_w
        u = _load_scaled(planes[1], d)
        v = _load_scaled(planes[2], d)
        if u.shape != y.shape:
            u = resize_plane(u, h, w, "bilinear")
            v = resize_plane(v, h, w, "bilinear")
        return y, u, v

    def _plan(self, planes):
        s = self.spec
        sd, dd = self.src_desc, self.dst_desc

        same_colorimetry = (
            _is_yuv(sd) == _is_yuv(dd) and self._src_full == self._dst_full
        )

        if _is_yuv(sd) and _is_yuv(dd) and same_colorimetry \
                and sd.nb_planes >= 2 and dd.nb_planes >= 2:
            # direct planar path: resize y/u/v in their own domains
            # (handles planar AND semi-planar nv12/nv21 layouts)
            comps = self._extract_yuv(planes, sd)
            resized = []
            for i, x in enumerate(comps):
                ph_d, pw_d = self._comp_shape(dd, i, s.dst_h, s.dst_w)
                resized.append(resize_plane(x, ph_d, pw_d, s.kernel))
            alpha = None
            if dd.has_alpha:
                ph_d, pw_d = dd.plane_shape(3, s.dst_h, s.dst_w)
                if sd.has_alpha and sd.nb_planes > 3:
                    a = _load_scaled(planes[3], sd)
                    alpha = resize_plane(a, ph_d, pw_d, s.kernel)
                else:
                    alpha = jnp.full(resized[0].shape[:-2] + (ph_d, pw_d),
                                     255.0)
            return self._emit_yuv(resized, alpha, dd)

        # general path through RGB 4:4:4
        rgb = self._to_rgb444(planes)
        rgb = resize_plane(
            jnp.moveaxis(rgb, -1, -3), s.dst_h, s.dst_w)
        rgb = jnp.moveaxis(rgb, -3, -1)

        if dd.is_rgb:
            return (self._pack_rgb(rgb, dd),)
        y, u, v = cs.rgb_to_yuv(rgb, s.csp, self._dst_full)
        outs = []
        for i, p in enumerate((y, u, v)[: dd.nb_planes]):
            ph_d, pw_d = dd.plane_shape(i, s.dst_h, s.dst_w)
            if p.shape[-2:] != (ph_d, pw_d):
                p = resize_plane(p, ph_d, pw_d, "bilinear")
            outs.append(_round_store(_store_domain(p, dd), dd))
        if dd.has_alpha:
            ph_d, pw_d = dd.plane_shape(3, s.dst_h, s.dst_w)
            outs.append(_round_store(
                jnp.full(y.shape[:-2] + (ph_d, pw_d), 255.0), dd))
        return tuple(outs)

    def _extract_yuv(self, planes, d: pf.PixFmtDesc):
        """Y/U/V float components at their stored resolutions, from
        planar or semi-planar (nv12/nv21) layouts."""
        y = _load_scaled(planes[0], d)
        if d.nb_planes >= 3:
            return [y, _load_scaled(planes[1], d), _load_scaled(planes[2], d)]
        comps = d.planes[1].components     # ("u","v") or ("v","u")
        c = _load_scaled(planes[1], d)
        u = c[..., comps.index("u")]
        v = c[..., comps.index("v")]
        return [y, u, v]

    @staticmethod
    def _comp_shape(d: pf.PixFmtDesc, comp: int, h: int, w: int):
        plane_i = comp if d.nb_planes >= 3 else min(comp, 1)
        return d.plane_shape(plane_i, h, w)

    def _emit_yuv(self, comps, alpha, d: pf.PixFmtDesc):
        stored = [_round_store(_store_domain(x, d), d) for x in comps]
        if d.nb_planes >= 3:
            out = stored[:3]
            if alpha is not None:
                out.append(_round_store(_store_domain(alpha, d), d))
            return tuple(out)
        order = d.planes[1].components
        uv = jnp.stack([stored[1] if c == "u" else stored[2]
                        for c in order], axis=-1)
        return (stored[0], uv)

    def _pack_rgb(self, rgb: jax.Array, d: pf.PixFmtDesc) -> jax.Array:
        comps = d.planes[0].components
        chans = {"r": rgb[..., 0], "g": rgb[..., 1], "b": rgb[..., 2],
                 "a": jnp.full_like(rgb[..., 0], 255.0)}
        packed = jnp.stack([chans[c] for c in comps], axis=-1)
        return _round_store(_store_domain(packed, d), d)

    # -- public -------------------------------------------------------
    def scale_planes(self, planes):
        """Tuple of plane arrays (with optional leading batch dims)."""
        return self._fn(tuple(jnp.asarray(p) for p in planes))

    def scale_frame(self, frame: VideoFrame) -> VideoFrame:
        out_planes = self.scale_planes(frame.planes)
        return frame.replace(
            planes=tuple(out_planes),
            format=self.spec.dst_fmt,
            width=self.spec.dst_w,
            height=self.spec.dst_h,
            color_range=("jpeg" if self._dst_full else "mpeg"),
        )


@functools.lru_cache(maxsize=64)
def get_scaler(src_fmt: str, src_w: int, src_h: int,
               dst_fmt: str, dst_w: int, dst_h: int,
               kernel: str = "bicubic", csp: str = "bt601",
               src_full: bool | None = None,
               dst_full: bool | None = None) -> Scaler:
    """Cached scaler lookup (sws_getCachedContext analog)."""
    return Scaler(src_fmt, src_w, src_h, dst_fmt, dst_w, dst_h,
                  kernel, csp, src_full, dst_full)
