"""Separable polyphase FIR application on device.

The apply-side analog of swscale's hscale/vscale engines
(/root/reference/libswscale/hscale.c, vscale.c: per-row FIR loops with
SIMD kernels). TPU redesign: an axis resize is a banded linear map
src->dst; we materialize it as a dense [dst, src] matrix and run the
whole plane resize as one MXU GEMM (out = M_v @ X @ M_h^T). At typical
video sizes the MXU's throughput makes the dense form faster than any
gather-based sparse evaluation, and XLA fuses the surrounding
unpack/convert/pack elementwise work into the same pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from librempeg_tpu.ops.firdesign import clamp_filter_edges, scale_filter


@functools.lru_cache(maxsize=256)
def resize_matrix(src: int, dst: int, kernel: str = "bicubic") -> np.ndarray:
    """[dst, src] dense resize matrix with replicate edge handling."""
    taps, index = scale_filter(src, dst, kernel)
    taps, index = clamp_filter_edges(taps, index, src)
    m = np.zeros((dst, src), np.float32)
    n_taps = taps.shape[1]
    for d in range(dst):
        m[d, index[d]:index[d] + n_taps] += taps[d]
    return m


def resize_v(x: jax.Array, m: np.ndarray | jax.Array) -> jax.Array:
    """Resize the second-to-last axis: [..., H, W] with m [H', H].

    Under an active product mesh (-mesh spatial=N) the output rows are
    split across the 'spatial' axis; each shard contracts over the
    full input length, so results stay bit-identical."""
    from librempeg_tpu.parallel import product_mesh as PM

    mesh = PM.active_mesh()
    if mesh is not None and PM.spatial_size(mesh) > 1 \
            and not isinstance(m, jax.Array):
        return PM.resize_v_sharded(x, m, mesh)
    mm = jnp.asarray(m, dtype=x.dtype)
    return jnp.einsum("hk,...kw->...hw", mm, x,
                      preferred_element_type=x.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def resize_h(x: jax.Array, m: np.ndarray | jax.Array) -> jax.Array:
    """Resize the last axis: [..., H, W] with m [W', W]."""
    mm = jnp.asarray(m, dtype=x.dtype)
    return jnp.einsum("...hk,wk->...hw", x, mm,
                      preferred_element_type=x.dtype,
                      precision=jax.lax.Precision.HIGHEST)


def resize_plane(x: jax.Array, dst_h: int, dst_w: int,
                 kernel: str = "bicubic") -> jax.Array:
    """Full separable resize of [..., H, W] float tensors."""
    *_, h, w = x.shape
    if h != dst_h:
        x = resize_v(x, resize_matrix(h, dst_h, kernel))
    if w != dst_w:
        x = resize_h(x, resize_matrix(w, dst_w, kernel))
    return x
