"""Cross-chip stage pipelining (pipeline parallelism).

The TPU analog of the reference's frame-threading pipeline
(pthread_frame.c: decoder clone k works on frame n+k) at CHIP
granularity: pipeline stages live on different devices along a mesh
axis; microbatches of frames flow through the ring via
`jax.lax.ppermute` (ICI neighbor hand-off), so stage s processes
microbatch m while stage s-1 already works on microbatch m+1 — the
classic GPipe-style schedule, expressed with shard_map.

Every device runs the same program; `lax.switch` on the stage index
selects that device's stage function (stages must share array shapes,
which media pipelines satisfy by padding to the shape bucket).
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_pipeline(stage_fns: Sequence[Callable[[jax.Array], jax.Array]],
                  mesh: Mesh, axis: str = "stage"):
    """Build a pipelined map over microbatches.

    stage_fns: one function per pipeline stage (all [mb, ...] -> same
    shape). Returns fn(x: [n_micro, mb, ...]) -> [n_micro, mb, ...] with
    each microbatch passed through all stages in order, stages resident
    on successive devices along `axis`.
    """
    n_stages = len(stage_fns)
    assert mesh.shape[axis] == n_stages, (
        f"pipeline needs exactly one device per stage: axis {axis} has "
        f"{mesh.shape[axis]} devices for {n_stages} stages "
        f"(pad with identity stages)")

    def body(x):
        # x: [n_micro_local = n_micro, mb, ...] replicated along the axis
        stage = jax.lax.axis_index(axis)
        n_micro = x.shape[0]
        steps = n_micro + n_stages - 1
        perm = [(i, (i + 1) % jax.lax.axis_size(axis))
                for i in range(jax.lax.axis_size(axis))]

        def apply_stage(v):
            return jax.lax.switch(jnp.minimum(stage, n_stages - 1),
                                  list(stage_fns), v)

        carry = jnp.zeros_like(x[0])
        outputs = jnp.zeros_like(x)

        def step_fn(t, state):
            carry, outputs = state
            # stage 0 ingests microbatch t (if in range) from x
            mb_idx = jnp.clip(t, 0, n_micro - 1)
            fresh = x[mb_idx]
            inp = jnp.where(stage == 0,
                            jnp.where(t < n_micro, fresh,
                                      jnp.zeros_like(fresh)),
                            carry)
            out = apply_stage(inp)
            # the LAST stage finishes microbatch t-(n_stages-1) at step t
            done_idx = t - (n_stages - 1)
            store = (stage == n_stages - 1) & (done_idx >= 0)
            outputs = jax.lax.cond(
                store,
                lambda o: o.at[jnp.clip(done_idx, 0, n_micro - 1)].set(out),
                lambda o: o,
                outputs)
            # hand off to the next stage over the ring
            carry = jax.lax.ppermute(out, axis, perm)
            return carry, outputs

        carry, outputs = jax.lax.fori_loop(0, steps, step_fn,
                                           (carry, outputs))
        # only the last stage holds the finished outputs; broadcast them
        # back with a max over the axis (others contribute zeros)
        outputs = jnp.where(stage == n_stages - 1, outputs,
                            jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, axis)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(),        # microbatch stream replicated
        out_specs=P(),       # finished frames replicated
        check_vma=False,
    )
    return sharded
