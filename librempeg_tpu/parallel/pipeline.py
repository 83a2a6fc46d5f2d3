"""The flagship device pipeline: batched transcode step.

This is the device-side compute of BASELINE config 4 (decode -> scale ->
MPEG-4-class encode), expressed as ONE jitted program over a frame batch:

  scale: separable GEMM resize 1080p class -> target (ops/fir)
  motion: hierarchical block search + half-pel refine (ops/motion)
  transform: 8x8 fdct -> quantize -> dequant -> idct -> reconstruction
             (the encoder's in-loop decode, ops/dct8x8)

The reference runs these as per-macroblock scalar/SIMD loops across
pthread slices (mpegvideo_enc.c:3737-3902); here the whole frame batch is
tensors in HBM and every stage is MXU/VPU work, so frames-per-second
per chip is the single number that matters.

Multichip: `make_sharded_step` shards the batch over the mesh's 'data'
axis and row-shards a deblocking-style stencil over 'spatial' with halo
exchange — the §2.10 DP+TP mapping.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from librempeg_tpu.ops import dct8x8, motion
from librempeg_tpu.ops.fir import resize_matrix


def _quant_tables(qscale: float):
    """Flat quantizer (MPEG-4 style qscale*2 for AC, 8 for intra DC)."""
    q = np.full((8, 8), 2.0 * qscale, np.float32)
    q[0, 0] = 8.0
    return q


def encode_intra_like(y: jax.Array, qscale: float) -> dict[str, jax.Array]:
    """Intra path: fdct -> quant -> dequant -> idct (reconstruction)."""
    q = jnp.asarray(_quant_tables(qscale))
    blocks = dct8x8.to_blocks(y.astype(jnp.float32) - 128.0)
    coeffs = dct8x8.fdct(blocks)
    levels = jnp.round(coeffs / q)
    recon_blocks = dct8x8.idct(levels * q) + 128.0
    n, h, w = y.shape
    recon = dct8x8.from_blocks(recon_blocks, h, w)
    return {"levels": levels, "recon": jnp.clip(recon, 0.0, 255.0)}


def _pick_tile(size: int, target: int, align: int) -> int | None:
    """Largest divisor of `size` that is <= target and align-divisible."""
    best = None
    for d in range(align, min(size, target) + 1, align):
        if size % d == 0:
            best = d
    return best


def fused_search_mc(cur: jax.Array, ref: jax.Array, search_range: int):
    """Fused ME+MC: Pallas VMEM-resident kernel when the frame tiles
    cleanly (the fast path), XLA scan-fused fallback otherwise."""
    n, h, w = cur.shape
    th = _pick_tile(h, 160, 16)
    tw = _pick_tile(w, 512, 128)
    if th is not None and tw is not None:
        from librempeg_tpu.ops.pallas.mesearch import full_search_mc

        return full_search_mc(cur, ref, search_range, tile_h=th, tile_w=tw)
    return motion.full_search_mc_xla(cur, ref, search_range)


def encode_inter_like(cur: jax.Array, ref: jax.Array, qscale: float,
                      search_range: int = 4) -> dict[str, jax.Array]:
    """P-frame path: fused ME+MC -> residual transform -> recon.

    MVs are integer-pel in the fast path, matching the reference
    encoder's cheapest ME setting.
    """
    mv, _, pred = fused_search_mc(cur, ref, search_range)
    resid = cur.astype(jnp.float32) - pred
    q = jnp.asarray(_quant_tables(qscale))
    blocks = dct8x8.to_blocks(resid)
    levels = jnp.round(dct8x8.fdct(blocks) / q)
    rec_resid = dct8x8.idct(levels * q)
    n, h, w = cur.shape
    recon = pred + dct8x8.from_blocks(rec_resid, h, w)
    return {"mv": mv, "levels": levels,
            "recon": jnp.clip(recon, 0.0, 255.0)}


@functools.partial(jax.jit, static_argnames=("dst_h", "dst_w", "qscale"))
def transcode_step(y: jax.Array, u: jax.Array, v: jax.Array,
                   ref_y: jax.Array, dst_h: int, dst_w: int,
                   qscale: float = 4.0) -> dict[str, Any]:
    """Full device transcode step over a batch of yuv420 frames.

    y: [N, H, W]; u, v: [N, H/2, W/2]; ref_y: [N, dst_h, dst_w]
    (the previous reconstructed scaled luma, for P-frame coding).
    """
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    h, w = y.shape[-2], y.shape[-1]
    mv_y = jnp.asarray(resize_matrix(h, dst_h, "bicubic"))
    mh_y = jnp.asarray(resize_matrix(w, dst_w, "bicubic"))
    mv_c = jnp.asarray(resize_matrix(h // 2, dst_h // 2, "bicubic"))
    mh_c = jnp.asarray(resize_matrix(w // 2, dst_w // 2, "bicubic"))

    def rs(x, mv, mh):
        x = jnp.einsum("hk,nkw->nhw", mv, x,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("nhk,wk->nhw", x, mh,
                          precision=jax.lax.Precision.HIGHEST)

    sy = jnp.clip(rs(yf, mv_y, mh_y), 0.0, 255.0)
    su = jnp.clip(rs(uf, mv_c, mh_c), 0.0, 255.0)
    sv = jnp.clip(rs(vf, mv_c, mh_c), 0.0, 255.0)

    enc = encode_inter_like(sy, ref_y.astype(jnp.float32), qscale)
    enc_u = encode_intra_like(su, qscale)
    enc_v = encode_intra_like(sv, qscale)
    return {
        "y": enc["recon"], "u": enc_u["recon"], "v": enc_v["recon"],
        "mv": enc["mv"],
        "levels_y": enc["levels"],
        "levels_u": enc_u["levels"], "levels_v": enc_v["levels"],
    }


def make_sharded_step(mesh: Mesh, dst_h: int, dst_w: int,
                      qscale: float = 4.0):
    """Multi-chip transcode step: batch sharded over 'data' (DP), plus a
    row-sharded PRODUCTION stencil over 'spatial' with halo exchange
    (TP, the slice-threading analog): the H.264/half-pel vertical 6-tap
    interpolation of the reconstructed luma — the plane the next frame's
    sub-pel motion search reads (recon.qpel_planes h-plane)."""
    from librempeg_tpu.parallel.halo import (row_sharded_stencil,
                                             vfir6_halfpel)

    batch_sh = NamedSharding(mesh, P("data", None, None))
    # asymmetric taps: half-pel between rows r,r+1 reads r-2..r+3, so
    # with a symmetric 3-row halo the filter consumes xh[1:]
    halfpel = row_sharded_stencil(lambda xh: vfir6_halfpel(xh[..., 1:, :]),
                                  halo=3, mesh=mesh)

    def step(y, u, v, ref_y):
        out = transcode_step(y, u, v, ref_y, dst_h=dst_h, dst_w=dst_w,
                             qscale=qscale)
        # integer-exact sub-pel plane of the recon (TP across rows)
        out["y_halfpel"] = halfpel(
            out["y"].astype(jnp.int32)).astype(jnp.uint8)
        return out

    return jax.jit(
        step,
        in_shardings=(batch_sh, batch_sh, batch_sh, batch_sh),
    )


def mpeg4_stage_fns(src_h: int, src_w: int, dst_h: int, dst_w: int,
                    qscale: float = 4.0, n_stages: int = 2):
    """The real mpeg4-encoder device stages as ring-pipeline stage fns
    ([N, src_h, src_w] luma batches): scale (GEMM resize) then intra
    transform coding with in-loop recon. Extra stages (pipeline depth >
    2) append the half-pel interpolation of the recon."""
    mv = jnp.asarray(resize_matrix(src_h, dst_h, "bicubic"))
    mh = jnp.asarray(resize_matrix(src_w, dst_w, "bicubic"))

    def scale_stage(x):
        x = jnp.einsum("hk,nkw->nhw", mv, x,
                       precision=jax.lax.Precision.HIGHEST)
        x = jnp.einsum("nhk,wk->nhw", x, mh,
                       precision=jax.lax.Precision.HIGHEST)
        # keep stage I/O shape-stable for the ring: pad back to src dims
        return jnp.pad(jnp.clip(x, 0.0, 255.0),
                       ((0, 0), (0, src_h - dst_h), (0, src_w - dst_w)))

    def code_stage(x):
        sub = x[:, :dst_h, :dst_w]
        rec = encode_intra_like(sub, qscale)["recon"]
        return jnp.pad(rec, ((0, 0), (0, src_h - dst_h),
                             (0, src_w - dst_w)))

    def halfpel_stage(x):
        from librempeg_tpu.parallel.halo import vfir6_halfpel

        sub = x[:, :dst_h, :dst_w].astype(jnp.int32)
        pad = jnp.pad(sub, ((0, 0), (2, 3), (0, 0)), mode="edge")
        hp = vfir6_halfpel(pad).astype(jnp.float32)
        return jnp.pad(hp, ((0, 0), (0, src_h - dst_h),
                            (0, src_w - dst_w)))

    stages = [scale_stage, code_stage, halfpel_stage]
    while len(stages) < n_stages:
        stages.append(lambda x: x)
    return stages[:max(2, n_stages)]
