"""Block motion estimation & compensation.

Analog of the reference's me_cmp + motion_est engines
(/root/reference/libavcodec/me_cmp.c:1028 SAD/SSE/SATD tables;
motion_est.c:888 ff_estimate_p_frame_motion — EPZS/diamond searches) and
hpeldsp half-pel interpolation (hpeldsp.c).

TPU redesign: instead of per-block candidate loops, evaluate each
candidate displacement against the WHOLE frame at once (one shifted
subtract + per-block reduction over [H, W]), scanning candidates with
lax.scan. A hierarchical (coarse 4x -> refine) schedule brings the
candidate count down to ~dozens, each a bandwidth-bound VPU pass over a
frame batch — the data-parallel shape TPUs like. Costs are metric-based
(SAD), matching the reference's default me_cmp=sad behavior class.

All entry points take batched frames [N, H, W] float32/uint8 and a
static search range; outputs are per-macroblock MV fields [N, bh, bw, 2]
(in half-pel units where noted) and cost maps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def block_reduce(x: jax.Array, bs: int) -> jax.Array:
    """Sum over bs x bs tiles: [..., H, W] -> [..., H//bs, W//bs]."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // bs, bs, w // bs, bs)
    return x.sum(axis=(-3, -1))


def block_reduce_mm(x: jax.Array, bs: int) -> jax.Array:
    """block_reduce as two MXU matmuls: [N, H, W] -> [N, H//bs, W//bs]
    f32. On TPU the reshape form forces T(8,128) relayout copies every
    scan step (~35 us/candidate at 720p, measured); the matmul form
    rides the MXU instead. Exact for u8-magnitude inputs: bf16 holds
    integers to 256, products are x*1, accumulation is f32."""
    n, h, w = x.shape
    a = np.zeros((h // bs, h), np.float32)
    a[np.arange(h) // bs, np.arange(h)] = 1.0
    b = np.zeros((w, w // bs), np.float32)
    b[np.arange(w), np.arange(w) // bs] = 1.0
    ab = jnp.asarray(a, jnp.bfloat16)
    bb = jnp.asarray(b, jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        ab, xb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # [H//bs, N, W]
    # rows can reach bs*255 > 256: split so each bf16 operand stays an
    # exactly-representable integer (q <= 255, r <= bs-1)
    q = jnp.floor(rows * (1.0 / bs))
    r = rows - q * bs
    dn = (((2,), (0,)), ((), ()))
    out = bs * jax.lax.dot_general(
        q.astype(jnp.bfloat16), bb, dn,
        preferred_element_type=jnp.float32) + jax.lax.dot_general(
        r.astype(jnp.bfloat16), bb, dn,
        preferred_element_type=jnp.float32)         # [H//bs, N, W//bs]
    return out.transpose(1, 0, 2)


def _candidate_costs(cur: jax.Array, ref_pad: jax.Array,
                     cands: jax.Array, pad: int, bs: int) -> jax.Array:
    """SAD of every candidate displacement.

    cur: [N, H, W]; ref_pad: [N, H+2p, W+2p]; cands: [C, 2] (dy, dx)
    returns [C, N, bh, bw] int32-ish float costs.
    """
    n, h, w = cur.shape

    def body(carry, cand):
        dy, dx = cand[0], cand[1]
        shifted = jax.lax.dynamic_slice(
            ref_pad, (0, pad + dy, pad + dx), (n, h, w))
        sad = block_reduce(jnp.abs(cur - shifted), bs)
        return carry, sad

    _, costs = jax.lax.scan(body, None, cands)
    return costs


@functools.partial(jax.jit, static_argnames=("search_range", "block_size"))
def full_search(cur: jax.Array, ref: jax.Array, search_range: int = 8,
                block_size: int = 16):
    """Exhaustive integer-pel search.

    Returns (mv [N, bh, bw, 2] int32 (dy, dx), cost [N, bh, bw]).
    """
    cur = cur.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    r = search_range
    ref_pad = jnp.pad(ref, ((0, 0), (r, r), (r, r)), mode="edge")
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    cands = jnp.asarray(np.stack([dy.ravel(), dx.ravel()], axis=1))
    costs = _candidate_costs(cur, ref_pad, cands, r, block_size)
    best = jnp.argmin(costs, axis=0)                      # [N, bh, bw]
    mv = cands[best]                                      # [N, bh, bw, 2]
    cost = jnp.min(costs, axis=0)
    return mv.astype(jnp.int32), cost


def full_search_mc_prepadded(cur: jax.Array, ref_vpad: jax.Array,
                             search_range: int = 8,
                             block_size: int = 16, step: int = 1,
                             vpad: int | None = None):
    """full_search_mc_xla over a VERTICALLY pre-padded reference
    (rows already extended by `vpad` (default search_range) real
    neighbor rows, e.g. a shard-map halo exchange); horizontal padding
    stays replicate. Bit-identical to the unsharded search on the
    corresponding band."""
    n, h, w = cur.shape
    bs = block_size
    r = search_range
    if vpad is None:
        vpad = r
    curb = cur.astype(jnp.bfloat16)
    refb = ref_vpad.astype(jnp.bfloat16)
    ref_pad = jnp.pad(refb, ((0, 0), (0, 0), (r, r)), mode="edge")
    dy, dx = np.mgrid[-r:r + 1:step, -r:r + 1:step]
    cands = jnp.asarray(np.stack([dy.ravel() + vpad, dx.ravel() + r],
                                 axis=1))

    def body(carry, cand):
        best_cost, best_idx, pred = carry
        c_i = cand[2]
        shifted = jax.lax.dynamic_slice(ref_pad, (0, cand[0], cand[1]),
                                        (n, h, w))
        sad = block_reduce_mm(jnp.abs(curb - shifted), bs)
        take = sad < best_cost
        best_cost = jnp.where(take, sad, best_cost)
        best_idx = jnp.where(take, c_i, best_idx)
        take_pix = jnp.repeat(jnp.repeat(take, bs, axis=1), bs, axis=2)
        pred = jnp.where(take_pix, shifted, pred)
        return (best_cost, best_idx, pred), None

    ncand = cands.shape[0]
    idx_col = jnp.arange(ncand, dtype=jnp.int32)[:, None]
    cands3 = jnp.concatenate([cands.astype(jnp.int32), idx_col], axis=1)
    bh, bw = h // bs, w // bs
    init = (jnp.full((n, bh, bw), 3.4e38, jnp.float32),
            jnp.zeros((n, bh, bw), jnp.int32),
            jnp.zeros((n, h, w), jnp.bfloat16))
    (cost, idx, pred), _ = jax.lax.scan(body, init, cands3)
    mv = (cands.astype(jnp.int32)
          - jnp.asarray([vpad, r], jnp.int32)[None, :])[idx]
    return mv, cost, pred.astype(jnp.float32)


def full_search_mc_hpel_prepadded(cur: jax.Array, ref_vpad: jax.Array,
                                  search_range: int = 8,
                                  block_size: int = 16,
                                  rounding: int = 0, step: int = 2):
    """Integer prepadded search + half-pel refinement over a band whose
    reference carries a (search_range+2)-row halo."""
    r = search_range
    mv_i, _, _ = full_search_mc_prepadded(cur, ref_vpad, r, block_size,
                                          step, vpad=r + 2)
    ref_pad = jnp.pad(ref_vpad.astype(jnp.int32),
                      ((0, 0), (0, 0), (r + 2, r + 2)), mode="edge")
    return _hpel_refine(cur, ref_pad, r + 2, r + 2, mv_i, rounding,
                        block_size)


@functools.partial(jax.jit, static_argnames=("search_range",
                                             "block_size", "step"))
def full_search_mc_xla(cur: jax.Array, ref: jax.Array,
                       search_range: int = 8, block_size: int = 16,
                       step: int = 1):
    """Fused exhaustive search + motion compensation, pure XLA.

    One lax.scan over candidate displacements carries (best cost, best
    mv, prediction); each step is whole-frame shifted-SAD (bf16 loads,
    f32 accumulate) plus a masked overwrite of winning blocks — no
    data-dependent gathers, which XLA-on-TPU executes poorly.
    `step` restricts the candidate lattice (step=2: even-pel search at
    full resolution — cheaper than downsampling AND it fuses the MC).

    Returns (mv [N,bh,bw,2] int32, cost [N,bh,bw] f32, pred [N,H,W] f32).
    """
    n, h, w = cur.shape
    bs = block_size
    r = search_range
    curb = cur.astype(jnp.bfloat16)
    refb = ref.astype(jnp.bfloat16)
    ref_pad = jnp.pad(refb, ((0, 0), (r, r), (r, r)), mode="edge")
    dy, dx = np.mgrid[-r:r + 1:step, -r:r + 1:step]
    cands = jnp.asarray(np.stack([dy.ravel() + r, dx.ravel() + r], axis=1))

    def body(carry, cand):
        best_cost, best_idx, pred = carry
        c_i = cand[2]
        shifted = jax.lax.dynamic_slice(ref_pad, (0, cand[0], cand[1]),
                                        (n, h, w))
        sad = block_reduce_mm(jnp.abs(curb - shifted), bs)
        take = sad < best_cost
        best_cost = jnp.where(take, sad, best_cost)
        best_idx = jnp.where(take, c_i, best_idx)
        take_pix = jnp.repeat(jnp.repeat(take, bs, axis=1), bs, axis=2)
        pred = jnp.where(take_pix, shifted, pred)
        return (best_cost, best_idx, pred), None

    ncand = cands.shape[0]
    idx_col = jnp.arange(ncand, dtype=jnp.int32)[:, None]
    cands3 = jnp.concatenate([cands.astype(jnp.int32), idx_col], axis=1)
    bh, bw = h // bs, w // bs
    init = (jnp.full((n, bh, bw), 3.4e38, jnp.float32),
            jnp.zeros((n, bh, bw), jnp.int32),
            jnp.zeros((n, h, w), jnp.bfloat16))
    (cost, idx, pred), _ = jax.lax.scan(body, init, cands3)
    mv = (cands.astype(jnp.int32) - r)[idx]      # tiny-table lookup
    return mv, cost, pred.astype(jnp.float32)


def _gather_windows(ref_pad, oy, ox, win):
    """[N,Hp,Wp] + per-block top-left (padded coords) -> block windows
    [N,bh,bw,win,win] (one moderate gather per frame)."""
    n = ref_pad.shape[0]
    iy = oy[..., None, None] + jnp.arange(win)[None, None, None, :, None]
    ix = ox[..., None, None] + jnp.arange(win)[None, None, None, None, :]
    nidx = jnp.arange(n)[:, None, None, None, None]
    return ref_pad[nidx, iy, ix]


def _hpel_refine(cur, ref_pad, pad_y, pad_x, mv_i, rounding, bs):
    """Half-pel refinement around per-block integer winners.

    cur [N,H,W]; ref_pad int-valued [N,H+2py,W+2px]; mv_i [N,bh,bw,2]
    (pixel units, |mv| <= pad-1).  Interpolation follows the decoder's
    integer half-pel rules ((a+b+1-rnd)>>1 / (4-sum+2-rnd)>>2), so the
    returned prediction is exactly what a conforming decoder computes.
    Returns (mv half-pel [N,bh,bw,2], cost f32, pred f32 int-valued).
    """
    n, h, w = cur.shape
    bh, bw = h // bs, w // bs
    rr = 2                  # half-pel refinement radius (covers the
    #                         odd integer MVs a step-2 stage-1 misses)
    win = bs + 2 * rr - 1
    by = (jnp.arange(bh) * bs)[None, :, None]
    bx = (jnp.arange(bw) * bs)[None, None, :]
    oy = by + mv_i[..., 0] + pad_y - 1
    ox = bx + mv_i[..., 1] + pad_x - 1
    wd = _gather_windows(ref_pad.astype(jnp.int32), oy, ox, win)
    curb = cur.reshape(n, bh, bs, bw, bs).transpose(0, 1, 3, 2, 4) \
        .astype(jnp.int32)
    r1 = 1 - rounding
    r2 = 2 - rounding

    def sub(dy, dx):
        return jax.lax.dynamic_slice(
            wd, (0, 0, 0, 1 + dy, 1 + dx), (n, bh, bw, bs, bs))

    best_cost = jnp.full((n, bh, bw), 2 ** 31 - 1, jnp.int32)
    best_d = jnp.zeros((n, bh, bw, 2), jnp.int32)
    best_pred = jnp.zeros((n, bh, bw, bs, bs), jnp.int32)
    for dy in range(-rr, rr + 1):
        for dx in range(-rr, rr + 1):
            ody, odx = dy >> 1, dx >> 1
            fy, fx = dy & 1, dx & 1
            a = sub(ody, odx)
            if fy == 0 and fx == 0:
                p = a
            elif fy == 0:
                p = (a + sub(ody, odx + 1) + r1) >> 1
            elif fx == 0:
                p = (a + sub(ody + 1, odx) + r1) >> 1
            else:
                p = (a + sub(ody, odx + 1) + sub(ody + 1, odx)
                     + sub(ody + 1, odx + 1) + r2) >> 2
            sad = jnp.abs(curb - p).sum(axis=(-2, -1))
            take = sad < best_cost
            best_cost = jnp.where(take, sad, best_cost)
            best_d = jnp.where(
                take[..., None],
                jnp.asarray([dy, dx], jnp.int32)[None, None, None, :],
                best_d)
            best_pred = jnp.where(take[..., None, None], p, best_pred)
    mv_h = 2 * mv_i + best_d
    pred = best_pred.transpose(0, 1, 3, 2, 4).reshape(n, h, w)
    return mv_h, best_cost.astype(jnp.float32), \
        pred.astype(jnp.float32)


def full_search_mc_hpel(cur: jax.Array, ref: jax.Array,
                        search_range: int = 8, block_size: int = 16,
                        rounding: int = 0, step: int = 2):
    """Integer full search (shifted-SAD scan) + half-pel refinement.

    Returns (mv [N,bh,bw,2] int32 HALF-PEL units, cost, pred f32) —
    the prediction is decoder-exact for vop_rounding_type=`rounding`.
    """
    mv_i, _, _ = full_search_mc_xla(cur, ref, search_range,
                                    block_size, step)
    pad = search_range + 2
    ref_pad = jnp.pad(ref.astype(jnp.int32),
                      ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return _hpel_refine(cur, ref_pad, pad, pad, mv_i, rounding,
                        block_size)


def mc_hpel(ref: jax.Array, mv_h: jax.Array, block_size: int,
            pad: int, rounding: int = 0) -> jax.Array:
    """Half-pel motion compensation at given per-block half-pel MVs
    (decoder-exact integer interpolation). ref [N,H,W]; mv_h
    [N,bh,bw,2]; |mv_h| <= 2*(pad-1)."""
    n, h, w = ref.shape
    bs = block_size
    bh, bw = h // bs, w // bs
    ref_pad = jnp.pad(ref.astype(jnp.int32),
                      ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    iy = mv_h[..., 0] >> 1
    ix = mv_h[..., 1] >> 1
    fy = (mv_h[..., 0] & 1)[..., None, None]
    fx = (mv_h[..., 1] & 1)[..., None, None]
    by = (jnp.arange(bh) * bs)[None, :, None]
    bx = (jnp.arange(bw) * bs)[None, None, :]
    wd = _gather_windows(ref_pad, by + iy + pad, bx + ix + pad, bs + 1)
    r1 = 1 - rounding
    r2 = 2 - rounding
    a = wd[..., :bs, :bs]
    b = wd[..., :bs, 1:]
    c = wd[..., 1:, :bs]
    d = wd[..., 1:, 1:]
    p_h = (a + b + r1) >> 1
    p_v = (a + c + r1) >> 1
    p_hv = (a + b + c + d + r2) >> 2
    p = jnp.where(fy == 0, jnp.where(fx == 0, a, p_h),
                  jnp.where(fx == 0, p_v, p_hv))
    return p.transpose(0, 1, 3, 2, 4).reshape(n, h, w) \
        .astype(jnp.float32)




def mc_hpel_vpad(ref_vpad: jax.Array, mv_h: jax.Array, block_size: int,
                 pad_y: int, pad_x: int, rounding: int = 0) -> jax.Array:
    """mc_hpel over a vertically pre-padded reference band (halo rows
    already exchanged); horizontal padding stays replicate-local."""
    n, hp, w = ref_vpad.shape
    h = hp - 2 * pad_y
    bs = block_size
    bh, bw = h // bs, w // bs
    ref_pad = jnp.pad(ref_vpad.astype(jnp.int32),
                      ((0, 0), (0, 0), (pad_x, pad_x)), mode="edge")
    iy = mv_h[..., 0] >> 1
    ix = mv_h[..., 1] >> 1
    fy = (mv_h[..., 0] & 1)[..., None, None]
    fx = (mv_h[..., 1] & 1)[..., None, None]
    by = (jnp.arange(bh) * bs)[None, :, None]
    bx = (jnp.arange(bw) * bs)[None, None, :]
    wd = _gather_windows(ref_pad, by + iy + pad_y, bx + ix + pad_x,
                         bs + 1)
    r1 = 1 - rounding
    r2 = 2 - rounding
    a = wd[..., :bs, :bs]
    b = wd[..., :bs, 1:]
    c = wd[..., 1:, :bs]
    d = wd[..., 1:, 1:]
    p = jnp.where(fy == 0,
                  jnp.where(fx == 0, a, (a + b + r1) >> 1),
                  jnp.where(fx == 0, (a + c + r1) >> 1,
                            (a + b + c + d + r2) >> 2))
    return p.transpose(0, 1, 3, 2, 4).reshape(n, h, w)         .astype(jnp.float32)


def _median3x3(mv: jax.Array) -> jax.Array:
    """Per-component 3x3 median over the block grid [N, bh, bw, 2]."""
    p = jnp.pad(mv, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    stack = jnp.stack([
        p[:, dy:dy + mv.shape[1], dx:dx + mv.shape[2]]
        for dy in range(3) for dx in range(3)
    ])
    return jnp.median(stack, axis=0).astype(mv.dtype)


@functools.partial(jax.jit, static_argnames=("search_range", "block_size",
                                             "refine"))
def hierarchical_search(cur: jax.Array, ref: jax.Array,
                        search_range: int = 16, block_size: int = 16,
                        refine: int = 3):
    """Coarse-to-fine search: full search at 1/4 resolution, then a
    +/-refine full-res refinement around the upscaled winner — the TPU
    analog of EPZS's predictor-then-refine structure.
    """
    cur = cur.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n, h, w = cur.shape

    # 4x4 box-downsample (cheap pyramid level)
    cur4 = block_reduce(cur, 4) / 16.0
    ref4 = block_reduce(ref, 4) / 16.0
    r4 = max(1, search_range // 4)
    bs4 = block_size // 4
    mv4, _ = full_search(cur4, ref4, r4, bs4)
    # 3x3 vector-median smoothing of the coarse field: rejects outlier
    # coarse winners on low-texture blocks (the role of EPZS's
    # neighborhood predictors in the reference, motion_est.c)
    mv4 = _median3x3(mv4)
    base_mv = mv4 * 4                                      # [N, bh, bw, 2]

    # refinement candidates around the coarse winner
    rr = refine
    dy, dx = np.mgrid[-rr:rr + 1, -rr:rr + 1]
    deltas = np.stack([dy.ravel(), dx.ravel()], axis=1)    # [C, 2]
    pad = search_range + rr + 4
    ref_pad = jnp.pad(ref, ((0, 0), (pad, pad), (pad, pad)), mode="edge")

    bh, bw = h // block_size, w // block_size
    # gather per-block windows at base_mv: window top-left in padded coords
    by = (jnp.arange(bh) * block_size)[None, :, None]
    bx = (jnp.arange(bw) * block_size)[None, None, :]
    cur_blocks = cur.reshape(n, bh, block_size, bw, block_size).transpose(
        0, 1, 3, 2, 4)                                     # [N,bh,bw,bs,bs]

    def gather_block(img_pad, oy, ox):
        # img_pad: [N, Hp, Wp]; oy/ox: [N, bh, bw] absolute top-left
        iy = oy[..., None, None] + jnp.arange(block_size)[None, None, None, :, None]
        ix = ox[..., None, None] + jnp.arange(block_size)[None, None, None, None, :]
        nidx = jnp.arange(n)[:, None, None, None, None]
        return img_pad[nidx, iy, ix]

    def body(carry, delta):
        oy = by + base_mv[..., 0] + delta[0] + pad
        ox = bx + base_mv[..., 1] + delta[1] + pad
        blocks = gather_block(ref_pad, oy, ox)
        sad = jnp.abs(cur_blocks - blocks).sum(axis=(-2, -1))
        return carry, sad

    _, costs = jax.lax.scan(body, None, jnp.asarray(deltas))  # [C,N,bh,bw]
    best = jnp.argmin(costs, axis=0)
    mv = base_mv + jnp.asarray(deltas)[best]
    # clamp to legal range
    mv = jnp.clip(mv, -search_range, search_range)
    return mv.astype(jnp.int32), jnp.min(costs, axis=0)


@functools.partial(jax.jit, static_argnames=("block_size",
                                             "search_range"))
def motion_compensate_scan(ref: jax.Array, mv: jax.Array,
                           block_size: int, search_range: int
                           ) -> jax.Array:
    """Gather-free motion compensation for small integer MV ranges:
    scan the (2r+1)^2 displacement lattice, masked-select the blocks
    whose MV matches. XLA gathers cost ~12 ns/element on v5e — for a
    720p plane that is ~11 ms; this scan is bandwidth-bound instead.

    ref: [N, H, W]; mv: [N, bh, bw, 2] with |mv| <= search_range.
    """
    n, h, w = ref.shape
    bs = block_size
    r = search_range
    ref_pad = jnp.pad(ref, ((0, 0), (r, r), (r, r)), mode="edge")
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    cands = jnp.asarray(
        np.stack([dy.ravel(), dx.ravel()], axis=1).astype(np.int32))

    def body(pred, cand):
        shifted = jax.lax.dynamic_slice(
            ref_pad, (0, cand[0] + r, cand[1] + r), (n, h, w))
        take = (mv[..., 0] == cand[0]) & (mv[..., 1] == cand[1])
        take_pix = jnp.repeat(jnp.repeat(take, bs, axis=1), bs, axis=2)
        return jnp.where(take_pix, shifted, pred), None

    pred, _ = jax.lax.scan(body, jnp.zeros_like(ref), cands)
    return pred


def motion_compensate_scan_prepadded(ref_vpad: jax.Array,
                                     mv: jax.Array, block_size: int,
                                     search_range: int) -> jax.Array:
    """motion_compensate_scan over a vertically pre-padded reference
    (halo-exchanged band); horizontal padding stays replicate."""
    n, hp, w = ref_vpad.shape
    bs = block_size
    r = search_range
    h = hp - 2 * r
    ref_pad = jnp.pad(ref_vpad, ((0, 0), (0, 0), (r, r)), mode="edge")
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    cands = jnp.asarray(
        np.stack([dy.ravel(), dx.ravel()], axis=1).astype(np.int32))

    def body(pred, cand):
        shifted = jax.lax.dynamic_slice(
            ref_pad, (0, cand[0] + r, cand[1] + r), (n, h, w))
        take = (mv[..., 0] == cand[0]) & (mv[..., 1] == cand[1])
        take_pix = jnp.repeat(jnp.repeat(take, bs, axis=1), bs, axis=2)
        return jnp.where(take_pix, shifted, pred), None

    pred, _ = jax.lax.scan(
        body, jnp.zeros((n, h, w), ref_vpad.dtype), cands)
    return pred


@functools.partial(jax.jit, static_argnames=("block_size",))
def motion_compensate(ref: jax.Array, mv: jax.Array, block_size: int = 16
                      ) -> jax.Array:
    """Build the prediction frame from per-block integer MVs.

    ref: [N, H, W]; mv: [N, bh, bw, 2] (dy, dx) -> pred [N, H, W].
    """
    n, h, w = ref.shape
    bh, bw = h // block_size, w // block_size
    pad = 64
    ref_pad = jnp.pad(ref, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    by = (jnp.arange(bh) * block_size)[None, :, None]
    bx = (jnp.arange(bw) * block_size)[None, None, :]
    oy = by + mv[..., 0] + pad
    ox = bx + mv[..., 1] + pad
    iy = oy[..., None, None] + jnp.arange(block_size)[None, None, None, :, None]
    ix = ox[..., None, None] + jnp.arange(block_size)[None, None, None, None, :]
    nidx = jnp.arange(n)[:, None, None, None, None]
    blocks = ref_pad[nidx, iy, ix]                        # [N,bh,bw,bs,bs]
    return blocks.transpose(0, 1, 3, 2, 4).reshape(n, h, w)


@functools.partial(jax.jit, static_argnames=("block_size",))
def halfpel_refine(cur: jax.Array, ref: jax.Array, mv_int: jax.Array,
                   block_size: int = 16):
    """Half-pel refinement: test the 8 half-pel neighbors of each integer
    MV using bilinear interpolation (hpeldsp put_pixels semantics with
    the no-rounding averaging variant).

    Returns (mv_halfpel [N, bh, bw, 2] in half-pel units, cost).
    """
    cur = cur.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n, h, w = cur.shape
    bh, bw = h // block_size, w // block_size
    pad = 68
    ref_pad = jnp.pad(ref, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    cur_blocks = cur.reshape(n, bh, block_size, bw, block_size).transpose(
        0, 1, 3, 2, 4)
    by = (jnp.arange(bh) * block_size)[None, :, None]
    bx = (jnp.arange(bw) * block_size)[None, None, :]

    deltas = np.array([[dy, dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)])

    def sample(oy2, ox2):
        """Gather blocks at half-pel offsets (oy2/ox2 in half-pel units)."""
        iy0 = oy2 // 2
        ix0 = ox2 // 2
        fy = (oy2 % 2)[..., None, None]
        fx = (ox2 % 2)[..., None, None]
        iy = iy0[..., None, None] + jnp.arange(block_size)[None, None, None, :, None]
        ix = ix0[..., None, None] + jnp.arange(block_size)[None, None, None, None, :]
        nidx = jnp.arange(n)[:, None, None, None, None]
        p00 = ref_pad[nidx, iy, ix]
        p01 = ref_pad[nidx, iy, ix + 1]
        p10 = ref_pad[nidx, iy + 1, ix]
        p11 = ref_pad[nidx, iy + 1, ix + 1]
        fy = fy.astype(jnp.float32) * 0.5
        fx = fx.astype(jnp.float32) * 0.5
        top = p00 * (1 - fx) + p01 * fx
        bot = p10 * (1 - fx) + p11 * fx
        return top * (1 - fy) + bot * fy

    def body(carry, delta):
        oy2 = (by + mv_int[..., 0] + pad) * 2 + delta[0]
        ox2 = (bx + mv_int[..., 1] + pad) * 2 + delta[1]
        blocks = sample(oy2, ox2)
        sad = jnp.abs(cur_blocks - blocks).sum(axis=(-2, -1))
        return carry, sad

    _, costs = jax.lax.scan(body, None, jnp.asarray(deltas))
    best = jnp.argmin(costs, axis=0)
    mv_half = mv_int * 2 + jnp.asarray(deltas)[best]
    return mv_half.astype(jnp.int32), jnp.min(costs, axis=0)


@functools.partial(jax.jit, static_argnames=("block_size",))
def motion_compensate_halfpel(ref: jax.Array, mv_half: jax.Array,
                              block_size: int = 16) -> jax.Array:
    """Prediction from half-pel MVs (bilinear)."""
    n, h, w = ref.shape
    ref = ref.astype(jnp.float32)
    bh, bw = h // block_size, w // block_size
    pad = 68
    ref_pad = jnp.pad(ref, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    by = (jnp.arange(bh) * block_size)[None, :, None]
    bx = (jnp.arange(bw) * block_size)[None, None, :]
    oy2 = by * 2 + mv_half[..., 0] + 2 * pad
    ox2 = bx * 2 + mv_half[..., 1] + 2 * pad
    iy0 = oy2 // 2
    ix0 = ox2 // 2
    fy = (oy2 % 2).astype(jnp.float32)[..., None, None] * 0.5
    fx = (ox2 % 2).astype(jnp.float32)[..., None, None] * 0.5
    iy = iy0[..., None, None] + jnp.arange(block_size)[None, None, None, :, None]
    ix = ix0[..., None, None] + jnp.arange(block_size)[None, None, None, None, :]
    nidx = jnp.arange(n)[:, None, None, None, None]
    p00 = ref_pad[nidx, iy, ix]
    p01 = ref_pad[nidx, iy, ix + 1]
    p10 = ref_pad[nidx, iy + 1, ix]
    p11 = ref_pad[nidx, iy + 1, ix + 1]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    blocks = top * (1 - fy) + bot * fy
    return blocks.transpose(0, 1, 3, 2, 4).reshape(n, h, w)


def sad(a: jax.Array, b: jax.Array) -> jax.Array:
    """Whole-tensor SAD (me_cmp 'sad' metric)."""
    return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).sum()


def sse(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return (d * d).sum()


@functools.lru_cache(maxsize=None)
def _hadamard8() -> np.ndarray:
    h = np.array([[1.0]])
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    return h


def satd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum of absolute Hadamard-transformed differences over 8x8 blocks
    (me_cmp 'satd'/hadamard8_diff metric), batched [..., 8, 8]."""
    hm = jnp.asarray(_hadamard8(), jnp.float32)
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    t = jnp.einsum("ij,...jk,lk->...il", hm, d, hm,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.abs(t).sum(axis=(-2, -1))
