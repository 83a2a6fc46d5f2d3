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

    def step(y, u, v, ref):
        return transcode_step(y, u, v, ref, dst_h=dh, dst_w=dw, qscale=4.0)

    # warmup/compile
    out = step(y, u, v, ref)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(y, u, v, out["y"])  # feed recon back as reference
    jax.block_until_ready(out)
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
