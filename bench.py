"""Driver benchmark: 1080p transcode frames/sec/chip.

Measures the flagship device pipeline (librempeg_tpu.parallel.pipeline.
transcode_step: bicubic scale 1080p->720p + hierarchical ME + half-pel
MC + 8x8 transform coding with in-loop reconstruction) on whatever
accelerator jax selects (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the measured single-core reference throughput of
the comparable pipeline (23.6 fps — see BASELINE_MEASURED.md).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_FPS = 23.6  # BASELINE_MEASURED.md: scale+mpeg4, 1 core, C build


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    # persistent compile cache: tunneled-TPU compiles are minutes-slow;
    # the repo ships a warmed cache so reruns start instantly
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from librempeg_tpu.parallel.pipeline import transcode_step
    from librempeg_tpu.utils import testgen

    batch = 8
    h, w = 1088, 1920            # coded 1080p (16-aligned rows)
    dh, dw = 720, 1280
    rng = np.random.default_rng(0)

    ys, us, vs = [], [], []
    for i in range(batch):
        y, u, v = testgen.video_yuv420(w, h, i)
        ys.append(y)
        us.append(u)
        vs.append(v)
    y = jnp.asarray(np.stack(ys), jnp.float32)
    u = jnp.asarray(np.stack(us), jnp.float32)
    v = jnp.asarray(np.stack(vs), jnp.float32)
    ref = jnp.asarray(rng.integers(0, 256, (batch, dh, dw)), jnp.float32)

    iters = 4

    @jax.jit
    def chained(y, u, v, ref):
        """`iters` dependent transcode steps in ONE device program (the
        recon feeds the next step's reference), so host<->device sync
        latency is amortized like a production streaming pipeline."""

        def body(carry, _):
            out = transcode_step(y, u, v, carry, dst_h=dh, dst_w=dw,
                                 qscale=4.0)
            return out["y"], out["mv"].sum()

        final, sums = jax.lax.scan(body, ref, None, length=iters)
        return final, sums

    # warmup/compile (fetch a scalar: block_until_ready alone does not
    # force execution on tunneled-TPU platforms)
    out = chained(y, u, v, ref)
    float(jnp.sum(out[0]))

    t0 = time.perf_counter()
    out = chained(y, u, v, ref)
    float(jnp.sum(out[0]))
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "1080p transcode (scale+ME+DCT recon) frames/sec/chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
