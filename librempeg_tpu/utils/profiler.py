"""Profiling & tracing utilities.

Analog of the reference's timer layer (/root/reference/libavutil/
timer.h:118 START_TIMER/STOP_TIMER with histogram/outlier rejection,
checkasm --bench) adapted to the device model: device work is async, so
scoped timers force completion (tiny fetch — block_until_ready alone is
unreliable over tunneled platforms), and kernels can be benchmarked with
warm-up + trimmed statistics. jax.profiler trace capture wraps xplane.
"""
from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Any, Callable

import numpy as np

_records: dict[str, list[float]] = defaultdict(list)


def _force(value: Any) -> None:
    """Force device completion of a pytree (tunnel-safe)."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(value)
              if isinstance(x, jax.Array)]
    if leaves:
        float(jnp.sum(jnp.ravel(leaves[0])[:1]))


@contextlib.contextmanager
def scoped(name: str, result_holder: list | None = None):
    """START_TIMER/STOP_TIMER analog:

        with profiler.scoped("idct"):
            out = idct(x)
        # forces completion if the block appends its outputs to
        # result_holder; otherwise times dispatch only
    """
    t0 = time.perf_counter()
    yield
    if result_holder:
        _force(result_holder[-1])
    _records[name].append(time.perf_counter() - t0)


def bench_kernel(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                 name: str | None = None) -> dict:
    """checkasm --bench analog: timed kernel runs with outlier trimming.

    Returns {"mean_ms", "min_ms", "p50_ms", "iters"}.
    """
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    times.sort()
    trimmed = times[: max(1, len(times) * 3 // 4)]  # drop slowest quarter
    stats = {
        "mean_ms": statistics.fmean(trimmed),
        "min_ms": times[0],
        "p50_ms": times[len(times) // 2],
        "iters": iters,
    }
    if name:
        _records[name].extend(t / 1000 for t in trimmed)
    return stats


def report() -> dict[str, dict]:
    """Aggregate scoped-timer stats (print_report analog)."""
    out = {}
    for name, ts in _records.items():
        arr = np.asarray(ts)
        out[name] = {
            "calls": len(arr),
            "total_s": float(arr.sum()),
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p95_ms": float(np.percentile(arr, 95) * 1000),
        }
    return out


def reset() -> None:
    _records.clear()


@contextlib.contextmanager
def device_trace(path: str):
    """Capture an xplane trace viewable in TensorBoard/XProf
    (the TPU-native replacement for -benchmark_all)."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
