"""Device mesh construction.

The communication-fabric analog of SURVEY.md §2.10: where the reference
wires pthread queues between per-node threads, we lay out a
jax.sharding.Mesh and let XLA insert ICI collectives.

Axes:
  data     frame/stream batch parallelism (the reference's frame
           threading & multi-file parallelism)
  spatial  rows of a frame (the reference's slice threading), used with
           halo exchange for taps that cross shard borders
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor2(n: int, max_second: int = 4) -> tuple[int, int]:
    """Split n into (a, b) with b <= max_second, b | n, b maximal."""
    for b in range(min(n, max_second), 0, -1):
        if n % b == 0:
            return n // b, b
    return n, 1


def make_mesh(n_devices: int | None = None,
              axes: tuple[str, str] = ("data", "spatial"),
              shape: tuple[int, int] | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh: asked for {n_devices} devices but backend "
                f"has {len(devs)} ({devs[0].platform}); refusing to "
                f"silently build a smaller mesh")
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = factor2(n)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    return Mesh(np.array(devs).reshape(shape), axes)


def frame_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for [N, H, W] frame batches: batch over 'data', rows over
    'spatial' (when the op graph supports halo'd row sharding)."""
    if spatial:
        return NamedSharding(mesh, P("data", "spatial", None))
    return NamedSharding(mesh, P("data", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
