"""Sequence-parallel audio resampling.

SURVEY.md §2.10's SP row: the reference scales long sequences with
overlap-save chunking inside one node; here the sample axis itself is
sharded across chips, each shard resamples its span after exchanging
FIR-halo samples with its ring neighbors (ppermute over ICI) — the
overlap-save structure made multi-chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from librempeg_tpu.resample.resampler import Resampler


def make_sharded_resampler(r: Resampler, mesh: Mesh, axis: str = "spatial"):
    """Returns fn(x: [C, S]) -> [C, S * p // q] with the sample axis
    sharded over `axis`. S must be divisible by (q * axis_size)."""
    m = jnp.asarray(r._m_np)
    L, p = r._m_np.shape
    q = r.q
    left = r.left_pad
    right = L - q - left   # samples needed beyond the local span

    def body(x_local):
        n = jax.lax.axis_size(axis)
        # halo exchange: left_pad cols from the left neighbor, `right`
        # cols from the right neighbor (edges zero-padded)
        idx = jax.lax.axis_index(axis)
        from_left = jax.lax.ppermute(
            x_local[:, -left:], axis,
            [(i, (i + 1) % n) for i in range(n)]) if left else None
        from_right = jax.lax.ppermute(
            x_local[:, :right], axis,
            [(i, (i - 1) % n) for i in range(n)]) if right > 0 else None
        parts = []
        if left:
            zeros_l = jnp.zeros_like(from_left)
            parts.append(jnp.where(idx == 0, zeros_l, from_left))
        parts.append(x_local)
        if right > 0:
            zeros_r = jnp.zeros_like(from_right)
            parts.append(jnp.where(idx == n - 1, zeros_r, from_right))
        xx = jnp.concatenate(parts, axis=1)
        n_periods = x_local.shape[1] // q
        idx2 = (jnp.arange(n_periods) * q)[:, None] + jnp.arange(L)[None, :]
        chunks = xx[:, idx2]
        out = jnp.einsum("cnl,lp->cnp", chunks, m,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(x_local.shape[0], n_periods * p)

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis),
        check_vma=False))
