"""Pallas fused motion-search + motion-compensation kernel.

The TPU replacement for the reference's SAD inner loops
(/root/reference/libavcodec/me_cmp.c pix_abs16 family + motion_est.c
search drivers): one kernel instance DMAs a cur tile and its ref search
window into VMEM ONCE, then evaluates every candidate displacement from
on-chip memory — no HBM traffic per candidate, which is what makes the
XLA shift-per-candidate formulation bandwidth-bound.

Implementation notes (hard-won Mosaic constraints):
* Candidate shifts use STATIC slices from a Python-unrolled loop —
  `pltpu.roll` with a dynamic shift mis-compiles inside `fori_loop` on
  current Mosaic, and dynamic VMEM slices must be 8/128-aligned.
* Per-16x16-block SADs via 0/1 indicator GEMMs in bf16 with f32
  accumulation — exact for 8-bit pixel content (|diff| <= 255 fits
  bf16's 8-bit mantissa; products vs 0/1 are exact; sums accumulate in
  f32) at the MXU's native rate.
* MC is fused into the candidate loop: winners overwrite their block's
  pixels through a mask expanded by the same indicators.

Grid: (N, H/TH, W/TW); outputs best-candidate index, cost, prediction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 16  # macroblock size


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(ref_hbm, cur_ref, idx_ref, cost_ref, pred_ref, win, best_cost_s,
            best_idx_s, sem, *, r: int, th: int, tw: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nb_y, nb_x = th // BS, tw // BS

    wh, ww = win.shape
    dma = pltpu.make_async_copy(
        ref_hbm.at[i, pl.ds(j * th, wh), pl.ds(k * tw, ww)], win, sem)
    dma.start()
    cur = cur_ref[0]
    # 0/1 block-sum indicators (built from iota: no host constants).
    # bf16 throughout: pixel data <= 255 and indicators are 0/1, so the
    # MXU's native bf16 x bf16 -> f32 products are EXACT for 8-bit video
    # (and within 1 bf16 ulp for the float intermediates of scaled
    # frames) at 2x the f32 multi-pass throughput.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (nb_y, th), 0)
    row_j = jax.lax.broadcasted_iota(jnp.int32, (nb_y, th), 1)
    a_row = (row_j // BS == row_i).astype(jnp.bfloat16)      # [nb_y, th]
    col_i = jax.lax.broadcasted_iota(jnp.int32, (tw, nb_x), 1)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (tw, nb_x), 0)
    a_col = (col_j // BS == col_i).astype(jnp.bfloat16)      # [tw, nb_x]
    a_row_f = a_row.astype(jnp.float32)
    a_col_f = a_col.astype(jnp.float32)
    dma.wait()
    wv = win[:, :]

    # accumulators live in scratch REFS (in-place updates), keeping the
    # statically-unrolled loop's VMEM live-set constant
    best_cost_s[:, :] = jnp.full((nb_y, nb_x), jnp.float32(3.4e38),
                                 jnp.float32)
    best_idx_s[:, :] = jnp.zeros((nb_y, nb_x), jnp.int32)
    pred_ref[0] = jnp.zeros((th, tw), jnp.bfloat16)
    side = 2 * r + 1
    for c in range(side * side):           # static unroll (Mosaic-safe)
        dy, dx = c // side, c % side
        shifted = jax.lax.slice(wv, (dy, dx), (dy + th, dx + tw))
        diff = jnp.abs(cur - shifted)
        sads = jnp.dot(jnp.dot(a_row, diff,
                               preferred_element_type=jnp.float32),
                       a_col_f, preferred_element_type=jnp.float32)
        take = sads < best_cost_s[:, :]
        best_cost_s[:, :] = jnp.where(take, sads, best_cost_s[:, :])
        best_idx_s[:, :] = jnp.where(take, c, best_idx_s[:, :])
        take_pix = jnp.dot(jnp.dot(a_row_f.T, take.astype(jnp.float32),
                                   preferred_element_type=jnp.float32),
                           a_col_f.T, preferred_element_type=jnp.float32)
        pred_ref[0] = jnp.where(take_pix > 0.5, shifted, pred_ref[0])

    idx_ref[0, 0, 0] = best_idx_s[:, :]
    cost_ref[0, 0, 0] = best_cost_s[:, :]


@functools.partial(jax.jit, static_argnames=("search_range", "tile_h",
                                             "tile_w"))
def full_search_mc(cur: jax.Array, ref: jax.Array, search_range: int = 4,
                   tile_h: int = 144, tile_w: int = 256):
    """Fused exhaustive search + prediction.

    cur/ref: [N, H, W] float32 (H % tile_h == 0, W % tile_w == 0 after
    tile clamping). Returns (mv [N,bh,bw,2] int32, cost [N,bh,bw] f32,
    pred [N,H,W] f32). Candidates near tile borders search within the
    tile's haloed window only (slice-local ME, like the reference's
    slice threading).
    """
    n, h, w = cur.shape
    r = search_range
    th, tw = min(tile_h, h), min(tile_w, w)
    assert h % th == 0 and w % tw == 0, (h, w, th, tw)
    cur = cur.astype(jnp.bfloat16)
    # over-pad so every tile's aligned DMA window stays in bounds
    # (bf16 sublane tiling is 16)
    wh = _round_up(th + 2 * r, 16)
    ww = _round_up(tw + 2 * r, 128)
    ref_pad = jnp.pad(ref.astype(jnp.bfloat16),
                      ((0, 0), (r, wh - th - r), (r, ww - tw - r)),
                      mode="edge")
    grid = (n, h // th, w // tw)
    nb_y, nb_x = th // BS, tw // BS

    idx, cost, pred = pl.pallas_call(
        functools.partial(_kernel, r=r, th=th, tw=tw),
        grid=grid,
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # ref stays in HBM
            pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # [N, ty, tx, nb_y, nb_x]: last two dims equal the full array
            # dims, satisfying the TPU block tiling constraint
            pl.BlockSpec((1, 1, 1, nb_y, nb_x),
                         lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, nb_y, nb_x),
                         lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h // th, w // tw, nb_y, nb_x),
                                 jnp.int32),
            jax.ShapeDtypeStruct((n, h // th, w // tw, nb_y, nb_x),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((wh, ww), jnp.bfloat16),
            pltpu.VMEM((nb_y, nb_x), jnp.float32),
            pltpu.VMEM((nb_y, nb_x), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ref_pad, cur)
    # [N, ty, tx, nb_y, nb_x] -> [N, bh, bw]
    idx = idx.transpose(0, 1, 3, 2, 4).reshape(n, h // BS, w // BS)
    cost = cost.transpose(0, 1, 3, 2, 4).reshape(n, h // BS, w // BS)
    side = 2 * r + 1
    mv = jnp.stack([idx // side - r, idx % side - r], axis=-1)
    return mv, cost, pred.astype(jnp.float32)
