"""Generate the committed H.264 bench input asset (one-time).

Produces assets/bench_1080p.264: 48 frames of 1920x1088 synthetic
content (moving gradient + textured blocks + noise band) encoded by our
own baseline encoder (qp 30, GOP 12, deblock on). The e2e benchmark
decodes this with our decoder; the reference decoder verifies it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from librempeg_tpu.codecs.h264.codec import H264Encoder  # noqa: E402
from librempeg_tpu.core.frame import VideoFrame  # noqa: E402
from librempeg_tpu.core.rational import Rational  # noqa: E402


def main(n_frames=48, W=1920, H=1088, qp=30):
    out = os.path.join(os.path.dirname(__file__), "..", "assets")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "bench_1080p.264")
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    rng = np.random.default_rng(42)
    texture = rng.integers(-24, 25, (H, W)).astype(np.int32)
    enc = H264Encoder(width=W, height=H, qp=qp, g=12, sr=4)
    data = b""
    t0 = time.time()
    for i in range(n_frames):
        # moving diagonal gradient + static texture + drifting bright box
        y = ((xx + yy + i * 6) // 6 % 220).astype(np.int32) + texture // 3
        bx, by = (i * 24) % (W - 256), (i * 12) % (H - 256)
        y[by:by + 256, bx:bx + 256] += 40
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] // 16 + i * 2) % 200 + 28).astype(np.uint8)
        v = ((yy[::2, ::2] // 16 + i) % 200 + 28).astype(np.uint8)
        f = VideoFrame(planes=(y, u, v), format="yuv420p", width=W,
                       height=H, pts=i, time_base=Rational(1, 25))
        for p in enc.encode(f):
            data += bytes(p.data)
        print(f"frame {i}: {len(data)} bytes total, "
              f"{time.time() - t0:.0f}s elapsed", flush=True)
    with open(path, "wb") as fh:
        fh.write(data)
    print("wrote", path, len(data), "bytes")


if __name__ == "__main__":
    main()
