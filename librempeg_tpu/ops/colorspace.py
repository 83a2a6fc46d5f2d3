"""Colorspace math: YUV<->RGB matrices, range conversion.

Analog of /root/reference/libswscale/yuv2rgb.c (matrixed conversion) and
libavutil/csp.c (primaries/coefficients tables). Device-side the
conversion is one 3x3 matmul + offset over [..., 3] pixels, fused by XLA
into neighboring passes.

Coefficient sets follow the standard Kr/Kb definitions (BT.601, BT.709,
BT.2020); ranges follow MPEG (Y 16..235, C 16..240) vs JPEG (full).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_KR_KB = {
    "bt601": (0.299, 0.114),
    "bt709": (0.2126, 0.0722),
    "bt2020": (0.2627, 0.0593),
    "smpte240m": (0.212, 0.087),
    "fcc": (0.30, 0.11),
}


@functools.lru_cache(maxsize=None)
def rgb_to_yuv_matrix(csp: str = "bt601", full_range: bool = False
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(M, offset): yuv = M @ rgb + offset, all in 0..255 domain."""
    kr, kb = _KR_KB[csp]
    kg = 1.0 - kr - kb
    # analog matrix: Ey in [0,1], Pb/Pr in [-.5,.5]
    m = np.array([
        [kr, kg, kb],
        [-0.5 * kr / (1 - kb), -0.5 * kg / (1 - kb), 0.5],
        [0.5, -0.5 * kg / (1 - kr), -0.5 * kb / (1 - kr)],
    ])
    if full_range:
        scale = np.diag([1.0, 1.0, 1.0])
        off = np.array([0.0, 128.0, 128.0])
    else:
        scale = np.diag([219.0 / 255.0, 224.0 / 255.0, 224.0 / 255.0])
        off = np.array([16.0, 128.0, 128.0])
    return (scale @ m).astype(np.float64), off


@functools.lru_cache(maxsize=None)
def yuv_to_rgb_matrix(csp: str = "bt601", full_range: bool = False
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(M, offset): rgb = M @ (yuv + offset) — offset applied pre-matrix."""
    m, off = rgb_to_yuv_matrix(csp, full_range)
    inv = np.linalg.inv(m)
    return inv, -off


def yuv_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array,
               csp: str = "bt601", full_range: bool = False) -> jax.Array:
    """Full-res float planes [..., H, W] -> [..., H, W, 3] float RGB 0..255."""
    m, off = yuv_to_rgb_matrix(csp, full_range)
    yuv = jnp.stack([y + off[0], u + off[1], v + off[2]], axis=-1)
    mm = jnp.asarray(m.T, dtype=yuv.dtype)
    return jnp.matmul(yuv, mm, preferred_element_type=yuv.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def rgb_to_yuv(rgb: jax.Array, csp: str = "bt601", full_range: bool = False
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[..., H, W, 3] float RGB 0..255 -> (y, u, v) full-res float planes."""
    m, off = rgb_to_yuv_matrix(csp, full_range)
    mm = jnp.asarray(m.T, dtype=rgb.dtype)
    yuv = jnp.matmul(rgb, mm, preferred_element_type=rgb.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    yuv = yuv + jnp.asarray(off, dtype=rgb.dtype)
    return yuv[..., 0], yuv[..., 1], yuv[..., 2]


def range_convert(y: jax.Array, u: jax.Array, v: jax.Array,
                  src_full: bool, dst_full: bool):
    """Limited<->full range luma/chroma rescale (swscale's range vectors)."""
    if src_full == dst_full:
        return y, u, v
    if src_full:  # full -> limited
        return (y * (219.0 / 255.0) + 16.0,
                (u - 128.0) * (224.0 / 255.0) + 128.0,
                (v - 128.0) * (224.0 / 255.0) + 128.0)
    # limited -> full
    return ((y - 16.0) * (255.0 / 219.0),
            (u - 128.0) * (255.0 / 224.0) + 128.0,
            (v - 128.0) * (255.0 / 224.0) + 128.0)
