"""Generic run-length Viterbi lattice for RD (trellis) quantization.

Shared by the MPEG-4/H.263 coder (codecs/mpeg4/trellis.py) and the
JPEG encoder: both entropy-code (run, level[, last]) events over
zigzag-ordered coefficients, so the same dense DP applies with
codec-specific candidate levels, distortions, and bit-cost tables.

The lattice mirrors the reference trellis quantizer's structure
(mpegvideo_enc.c:3923 dct_quantize_trellis_c) but is restructured
TPU-first: a ``lax.scan`` over the 64 zigzag positions whose state is
a [nblk, 65] cost tensor (state s = "last nonzero at position s-1",
s=0 = "nothing coded"), running every block's trellis in parallel
with no survivor pruning, dual continuation/termination lattices
(the argmin under not-last bit costs need not be the argmin under
last-code costs), and a vectorized backpointer walk.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e18


def viterbi_rl(zz: jax.Array, cands: jax.Array, dist_c: jax.Array,
               bidx: jax.Array, b0_tab: jax.Array, b1_tab: jax.Array,
               lam, first: int):
    """Minimize ``sum(distortion) + lam * sum(bits)`` over run-length
    coded zigzag coefficients.

    zz      [nblk, 64] float coefficients (sign source + zero cost c^2)
    cands   [nblk, 64, K] int32 candidate magnitudes (>= 1)
    dist_c  [nblk, 64, K] float distortion when coding that candidate
    bidx    [nblk, 64, K] int32 column index into the bit tables
    b0_tab  [64, C] float bits of a (run, col) event, not last
    b1_tab  [64, C] float bits of a (run, col) event as the LAST code
    lam     traced float scalar
    first   static first codable position (1 skips the DC slot)

    Returns int32 [nblk, 64] signed levels.
    """
    nblk, _, K = cands.shape
    lam = jnp.asarray(lam, jnp.float32)
    sgn = jnp.where(zz < 0, -1, 1).astype(jnp.int32)

    zsq = (zz * zz).astype(jnp.float32)
    zpre = jnp.concatenate(
        [jnp.zeros((nblk, 1), jnp.float32),
         jnp.cumsum(zsq, axis=1)], axis=1)               # [nblk,65]

    states = jnp.arange(65)
    prev_idx = jnp.where(states == 0, first - 1, states - 1)    # [65]

    cost0 = jnp.full((nblk, 65), _INF, jnp.float32).at[:, 0].set(0.0)

    def step(cost, pos):
        run = pos - prev_idx - 1                        # [65]
        valid = (states <= pos) & (run >= 0) & (run < 64) \
            & (pos >= first)
        runc = jnp.clip(run, 0, 63)
        # zeros skipped between prev+1 .. pos-1
        zskip = zpre[:, pos][:, None] \
            - zpre[jnp.arange(nblk)[:, None],
                   jnp.clip(prev_idx + 1, 0, 64)[None, :]]
        base = jnp.where(valid[None, :], cost + zskip, _INF)    # [nblk,65]
        lc = bidx[:, pos, :]                            # [nblk,K]
        bits0 = b0_tab[runc[None, :, None],
                       lc[:, None, :]]                  # [nblk,65,K]
        bits1 = b1_tab[runc[None, :, None], lc[:, None, :]]
        body = base[..., None] + dist_c[:, pos, None, :]
        # continuation lattice (this code is not last)
        flat = (body + lam * bits0).reshape(nblk, -1)
        best = jnp.argmin(flat, axis=1)
        bcost = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        bs, bk = best // K, best % K
        blev = jnp.take_along_axis(cands[:, pos, :], bk[:, None], 1)[:, 0]
        cost = cost.at[:, pos + 1].set(bcost)
        # termination lattice (this code is last; add trailing zeros)
        tailz = zpre[:, 64] - zpre[:, pos + 1]          # [nblk]
        flatl = (body + lam * bits1).reshape(nblk, -1)
        bestl = jnp.argmin(flatl, axis=1)
        lcost = jnp.take_along_axis(flatl, bestl[:, None], 1)[:, 0] + tailz
        ls, lk = bestl // K, bestl % K
        llev = jnp.take_along_axis(cands[:, pos, :], lk[:, None], 1)[:, 0]
        return cost, (bs.astype(jnp.int32), blev.astype(jnp.int32),
                      lcost, ls.astype(jnp.int32),
                      llev.astype(jnp.int32))

    cost, (bp, lev, lcost, lbp, llev) = jax.lax.scan(
        step, cost0, jnp.arange(64))
    # stacked [64 steps, nblk]; step i wrote continuation state i+1
    # and the best "ends exactly at position i" cost

    blkrange = jnp.arange(nblk)
    bestpos = jnp.argmin(lcost, axis=0).astype(jnp.int32)  # [nblk]
    bestcost = lcost[bestpos, blkrange]
    uncoded = zpre[:, 64] - zpre[:, first]
    coded = bestcost < uncoded

    # seed the traceback with the last coefficient, then follow the
    # continuation lattice's backpointers
    out0 = jnp.where(
        (jnp.arange(64)[None, :] == bestpos[:, None]) & coded[:, None],
        (llev[bestpos, blkrange]
         * sgn[blkrange, bestpos])[:, None],
        jnp.zeros((nblk, 64), jnp.int32))
    cur0 = jnp.where(coded, lbp[bestpos, blkrange], 0)

    def walk(carry, _):
        cur, out = carry
        active = cur > 0
        pos = jnp.clip(cur - 1, 0, 63)
        l = lev[pos, blkrange] * sgn[blkrange, pos]
        onehot = (jnp.arange(64)[None, :] == pos[:, None]) \
            & active[:, None]
        out = jnp.where(onehot, l[:, None], out)
        nxt = bp[pos, blkrange]
        cur = jnp.where(active, nxt, cur)
        return (cur, out), None

    (_, out), _ = jax.lax.scan(walk, (cur0, out0), None, length=64)
    return out
