"""Error concealment: repair corrupt macroblocks from valid neighbors.

Analog of /root/reference/libavcodec/error_resilience.c (1369 LoC of
MV/DC-interpolation concealment) re-expressed as a device op: given a
frame and a per-16x16-block corruption mask, corrupt blocks are filled
by iterative diffusion from valid neighbors (the DC-interpolation class
of the reference's guess_dc/guess_mv), entirely on the VPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block_size", "iters"))
def conceal_blocks(frame: jax.Array, bad_mask: jax.Array,
                   block_size: int = 16, iters: int = 8) -> jax.Array:
    """frame: [N, H, W] float; bad_mask: [N, H//bs, W//bs] bool.

    Returns the frame with corrupt blocks replaced by smooth fills
    propagated from valid neighbors (Jacobi diffusion at block
    granularity, then bilinear-upsampled into pixels).
    """
    n, h, w = frame.shape
    bs = block_size
    bh, bw = h // bs, w // bs
    # block means of valid content
    blocks = frame.reshape(n, bh, bs, bw, bs)
    means = blocks.mean(axis=(2, 4))
    good = ~bad_mask
    vals = jnp.where(good, means, 0.0)
    weight = good.astype(jnp.float32)

    def body(_, carry):
        vals, weight = carry
        # 4-neighbor diffusion
        vp = jnp.pad(vals, ((0, 0), (1, 1), (1, 1)))
        wp = jnp.pad(weight, ((0, 0), (1, 1), (1, 1)))
        acc = (vp[:, :-2, 1:-1] + vp[:, 2:, 1:-1]
               + vp[:, 1:-1, :-2] + vp[:, 1:-1, 2:])
        cnt = (wp[:, :-2, 1:-1] + wp[:, 2:, 1:-1]
               + wp[:, 1:-1, :-2] + wp[:, 1:-1, 2:])
        new_vals = jnp.where(weight > 0, vals,
                             jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1),
                                       vals))
        new_weight = jnp.where(weight > 0, weight,
                               (cnt > 0).astype(jnp.float32))
        return new_vals, new_weight

    vals, weight = jax.lax.fori_loop(0, iters, body, (vals, weight))
    fill = jnp.repeat(jnp.repeat(vals, bs, axis=1), bs, axis=2)
    mask_pix = jnp.repeat(jnp.repeat(bad_mask, bs, axis=1), bs, axis=2)
    return jnp.where(mask_pix, fill, frame)
