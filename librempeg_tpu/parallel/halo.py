"""Row-sharded stencils with halo exchange.

The TPU equivalent of the reference's slice threading for filters whose
taps cross slice borders (deblocking, vertical FIR — the reason
swscale's vscale pass synchronizes slices): each device holds a
contiguous row band of the frame; neighbors exchange `halo` edge rows
over ICI with ppermute, then the stencil runs locally.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def exchange_row_halo(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Inside shard_map: [.., rows, W] -> [.., rows + 2*halo, W] with
    neighbor rows (edge-replicated at the global boundary)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    # send bottom rows to the next device, top rows to the previous
    down = jax.lax.ppermute(
        x[..., -halo:, :], axis_name,
        [(i, (i + 1) % n) for i in range(n)])
    up = jax.lax.ppermute(
        x[..., :halo, :], axis_name,
        [(i, (i - 1) % n) for i in range(n)])
    # at global edges, replicate own border instead of the wrapped data
    top_edge = jnp.broadcast_to(x[..., :1, :], x.shape[:-2] + (halo, x.shape[-1]))
    bot_edge = jnp.broadcast_to(x[..., -1:, :], x.shape[:-2] + (halo, x.shape[-1]))
    top = jnp.where(idx == 0, top_edge, down)
    bot = jnp.where(idx == n - 1, bot_edge, up)
    return jnp.concatenate([top, x, bot], axis=-2)


def row_sharded_stencil(fn: Callable[[jax.Array], jax.Array], halo: int,
                        mesh: Mesh, axis_name: str = "spatial"):
    """Wrap `fn` (a stencil needing `halo` valid rows above/below; it gets
    [.., rows+2*halo, W] and must return [.., rows, W]) into a
    shard_map'ed op over row-sharded [N, H, W] input."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("data", axis_name, None),
        out_specs=P("data", axis_name, None))
    def sharded(x):
        xh = exchange_row_halo(x, halo, axis_name)
        return fn(xh)

    return sharded


def vblur3(xh: jax.Array) -> jax.Array:
    """Example 3-tap vertical stencil ([.., R+2, W] -> [.., R, W])."""
    return (xh[..., :-2, :] + 2.0 * xh[..., 1:-1, :] + xh[..., 2:, :]) * 0.25


def vfir6_halfpel(xh: jax.Array) -> jax.Array:
    """H.264 §8.4.2.2 vertical half-pel 6-tap [1,-5,20,20,-5,1] with
    (+16)>>5 rounding — the real production kernel whose taps cross row
    shards (the vscale-synchronization case). [.., R+6, W] -> [.., R, W]
    computing the half-pel sample between each row r and r+1.

    Integer-exact: run on int32 inputs to match the host decoder's
    native half-pel planes bit for bit."""
    v = (xh[..., 0:-5, :] - 5 * xh[..., 1:-4, :] + 20 * xh[..., 2:-3, :]
         + 20 * xh[..., 3:-2, :] - 5 * xh[..., 4:-1, :] + xh[..., 5:, :])
    return jnp.clip((v + 16) >> 5, 0, 255)
