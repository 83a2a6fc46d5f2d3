"""Wavefront (anti-diagonal) dependency scheduling on device.

SURVEY.md §2.10's SP/wavefront row: the reference handles
CTU-wavefront dependencies (VVC/HEVC WPP — each row starts behind the
row above; vvc/thread.c task graph on executor.c) with threads and
progress counters. The TPU-native expression: iterate ANTI-DIAGONALS
with lax.scan — every cell on a diagonal depends only on earlier
diagonals, so each scan step is one fully-vectorized VPU pass over a
diagonal's cells. No locks, no progress counters: the dependency
structure IS the iteration order.

`wavefront_scan` runs the recurrence
    out[i, j] = f(grid[i, j], out[i-1, j], out[i, j-1])
over the trailing [H, W] axes (out-of-range neighbors read `init`).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _gather_cols(x: jax.Array, cols: jax.Array) -> jax.Array:
    """x[..., i, cols[i]] for each row i -> [..., H]."""
    h = x.shape[-2]
    idx = jnp.broadcast_to(cols[:, None], x.shape[:-2] + (h, 1))
    return jnp.take_along_axis(x, idx, axis=-1)[..., 0]


def _scatter_cols(x: jax.Array, cols: jax.Array, vals: jax.Array,
                  valid: jax.Array) -> jax.Array:
    """Write vals[i] into x[..., i, cols[i]] where valid[i]."""
    cur = _gather_cols(x, cols)
    newv = jnp.where(valid, vals, cur)
    mask = jax.nn.one_hot(cols, x.shape[-1], dtype=bool)  # [H, W]
    return jnp.where(mask, newv[..., :, None], x)


def _neighbor_up(out: jax.Array, cols: jax.Array, init) -> jax.Array:
    shifted = jnp.concatenate(
        [jnp.full_like(out[..., :1, :], init), out[..., :-1, :]], axis=-2)
    return _gather_cols(shifted, cols)


def _neighbor_left(out: jax.Array, cols: jax.Array, init) -> jax.Array:
    shifted = jnp.concatenate(
        [jnp.full_like(out[..., :, :1], init), out[..., :, :-1]], axis=-1)
    return _gather_cols(shifted, cols)


def wavefront_scan(f: Callable, grid: jax.Array, init: float = 0.0
                   ) -> jax.Array:
    """out[i,j] = f(grid[i,j], out[i-1,j], out[i,j-1]), vectorized per
    anti-diagonal via lax.scan."""
    *lead, h, w = grid.shape
    rows = jnp.arange(h)

    def step(out, d):
        cols = d - rows                        # diagonal d's columns
        valid = (cols >= 0) & (cols < w)
        cc = jnp.clip(cols, 0, w - 1)
        g = _gather_cols(grid, cc)
        up = _neighbor_up(out, cc, init)
        left = _neighbor_left(out, cc, init)
        newvals = f(g, up, left)
        return _scatter_cols(out, cc, newvals, valid), None

    out0 = jnp.zeros_like(grid)
    out, _ = jax.lax.scan(step, out0, jnp.arange(h + w - 1))
    return out
