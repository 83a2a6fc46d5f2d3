"""Driver benchmark: 1080p transcode frames/sec/chip.

Measures two legs on whatever accelerator jax selects (the real TPU
chip under the driver):

- kernel leg: the flagship device pipeline (librempeg_tpu.parallel.
  pipeline.transcode_step: bicubic scale 1080p->720p + hierarchical ME
  + half-pel MC + 8x8 transform coding with in-loop reconstruction).
- e2e leg: the honest full-product path — real H.264 1080p bitstream
  decode -> scale 720p -> MPEG-4 encode -> AVI, measured like
  `ffmpeg -benchmark` steady state (reference fftools/ffmpeg.c:575,940).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is against the measured single-core reference throughput of
the comparable pipeline (23.6 fps — see BASELINE_MEASURED.md).

Resilience contract (VERDICT r3 #1a): a TPU-tunnel flake can never zero
a round again.  Each leg runs in its OWN subprocess (backend init
failures are sticky in-process) with retries + exponential backoff and
a hard per-attempt timeout; a leg that still fails contributes
value 0.0 plus an "error" field, and the final JSON line is ALWAYS
printed.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REFERENCE_FPS = 23.6  # BASELINE_MEASURED.md: scale+mpeg4, 1 core, C build
REPO = os.path.dirname(os.path.abspath(__file__))

# per-leg subprocess policy: tunneled-TPU first compiles are minutes-slow,
# so leg timeouts are generous -- but a global deadline bounds the whole
# bench so a dead tunnel can never exceed the driver's patience
ATTEMPTS = 2
TIMEOUT_S = {"probe": 420, "kernel": 1500, "e2e": 2100, "stages": 900}
BACKOFF_S = 20
DEADLINE_S = 5100          # hard cap on total bench wall-clock
_T0 = time.monotonic()


def _budget_left() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def _run_leg(name: str, attempts: int = ATTEMPTS) -> dict:
    """Run one bench leg in a fresh subprocess, with retries."""
    last_err = "unknown"
    for attempt in range(attempts):
        tmo = min(TIMEOUT_S[name], max(60, _budget_left()))
        if _budget_left() < 60:
            return {"fps": 0.0, "error": f"deadline: {last_err}"[:500]}
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", name],
                capture_output=True, text=True, timeout=tmo, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            last_err = f"timeout after {tmo:.0f}s"
            continue
        # the leg prints its result JSON on the LAST stdout line
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
                if isinstance(out, dict) and "fps" in out:
                    return out
            except (ValueError, TypeError):
                continue
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        last_err = " | ".join(tail[-3:]) if tail else f"rc={proc.returncode}"
        if attempt + 1 < attempts:
            time.sleep(BACKOFF_S * (2 ** attempt))
    return {"fps": 0.0, "error": last_err[:500]}


def main() -> None:
    # cheap backend probe first: when the TPU tunnel is dead, fail fast
    # with a diagnostic instead of burning the whole deadline on the
    # heavy legs (round-3 postmortem: BENCH_r03 recorded nothing)
    probe = _run_leg("probe", attempts=3)
    if probe.get("fps", 0.0) <= 0.0:
        print(json.dumps({
            "metric": "1080p transcode (scale+ME+DCT recon) "
                      "frames/sec/chip",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "e2e_fps": 0.0, "e2e_vs_baseline": 0.0,
            "error": "backend probe failed: "
                     + str(probe.get("error", ""))[:400],
        }))
        return
    kernel = _run_leg("kernel")
    e2e = _run_leg("e2e")
    result = {
        "metric": "1080p transcode (scale+ME+DCT recon) frames/sec/chip",
        "value": round(kernel.get("fps", 0.0), 2),
        "unit": "fps",
        "vs_baseline": round(kernel.get("fps", 0.0) / REFERENCE_FPS, 2),
        "e2e_metric": "h264 1080p dec -> scale -> mpeg4 enc (full CLI path)",
        "e2e_fps": round(e2e.get("fps", 0.0), 2),
        "e2e_vs_baseline": round(e2e.get("fps", 0.0) / REFERENCE_FPS, 3),
    }
    if "error" in kernel:
        result["kernel_error"] = kernel["error"]
    if "error" in e2e:
        result["e2e_error"] = e2e["error"]
    if "split" in e2e:
        result["e2e_split"] = e2e["split"]
    if _budget_left() > 180:
        stages = _run_leg("stages", attempts=1)
        if "ms" in stages:
            result["stage_ms"] = stages["ms"]
            result["roofline"] = stages.get("roofline", {})
    print(json.dumps(result))


# ---------------------------------------------------------------------------
# leg implementations (run inside the per-leg subprocess)
# ---------------------------------------------------------------------------

def _jax_setup():
    import jax

    sys.path.insert(0, REPO)
    # persistent compile cache: tunneled-TPU compiles are minutes-slow;
    # the repo ships a warmed cache so reruns start instantly
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _leg_probe() -> dict:
    """Minimal backend liveness check: init + one tiny device op."""
    jax = _jax_setup()
    import jax.numpy as jnp

    t0 = time.perf_counter()
    v = float(jnp.sum(jnp.ones((128, 128), jnp.float32)))
    assert v == 128.0 * 128.0
    return {"fps": 1.0, "probe_s": round(time.perf_counter() - t0, 2),
            "backend": jax.default_backend()}


def _leg_kernel() -> dict:
    import numpy as np

    jax = _jax_setup()
    import jax.numpy as jnp

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
    return {"fps": batch * iters / dt}


def _leg_e2e(warm: int = 16, measured: int = 24) -> dict:
    """Steady-state fps of the real bitstream->bitstream transcode on
    the committed 48-frame 1080p H.264 asset."""
    import tempfile

    _jax_setup()
    from librempeg_tpu.sched.pipeline import (StreamMap, TranscodeSpec,
                                              Transcoder)

    asset = os.path.join(REPO, "assets", "bench_1080p.264")
    if not os.path.exists(asset):
        return {"fps": 0.0, "error": "asset missing"}
    out = os.path.join(tempfile.gettempdir(), "bench_e2e.avi")
    spec = TranscodeSpec(
        input_url=asset, output_url=out,
        video=StreamMap(codec="mpeg4",
                        codec_opts={"bit_rate": 4_000_000},
                        width=1280, height=720))
    tc = Transcoder(spec)
    it = tc.demux.packets()
    chain = tc.chains[0]
    for _ in range(warm):                      # compile + cache warm
        chain.send_packet(next(it), tc.mux)
    chain.sync()
    from librempeg_tpu.utils import stagetimer

    stagetimer.reset()
    t0 = time.perf_counter()
    for _ in range(measured):
        chain.send_packet(next(it), tc.mux)
    chain.sync()                               # include in-flight encodes
    dt = time.perf_counter() - t0
    out = {"fps": measured / dt}
    if stagetimer.ENABLED:
        out["split"] = {k: v["s"]
                        for k, v in stagetimer.report().items()}
    return out


def _leg_stages() -> dict:
    """Per-device-program stage timings (tools/profile_decode.py /
    profile_encoder.py) plus a memory-roofline figure per stage:
    speed-of-light ms = plane/window bytes moved / v5e HBM BW (819
    GB/s). The x_of_sol ratio is the honest 'how far from the
    hardware' number the fps headline can hide (fftools/ffmpeg.c:575
    -benchmark is the reference's analog of the measured side)."""
    out: dict = {"fps": 1.0, "ms": {}, "roofline": {}}
    for script in ("profile_decode.py", "profile_encoder.py"):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", script),
                 *(["--frames", "6", "--reps", "4"]
                   if script == "profile_decode.py" else [])],
                capture_output=True, text=True,
                timeout=max(60, _budget_left() - 30), cwd=REPO)
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    d = json.loads(line)
                except (ValueError, TypeError):
                    continue
                out["ms"].update({k: round(v, 2) for k, v in d.items()
                                  if isinstance(v, (int, float))})
                break
        except subprocess.TimeoutExpired:
            out["ms"][script] = "timeout"
    # bytes-roofline @ 1080p/720p (HBM 819e9 B/s on v5e): planes or
    # DMA windows in+out per frame
    bw = 819e9
    sol_bytes = {
        "deblock_alone": 2 * (1088 * 1920 * 1.5),       # rw planes u8
        "mc_alone": 8160 * 4 * 32 * 256 + 1088 * 1920 * 1.5,
        "refpack_tile": 6 * 1088 * 1920 * 1.5,          # 4 luma + pad
        "hpel_refine_mc": 3600 * (48 * 256 + 2 * 32 * 256),
        "full_search": 2 * 720 * 1280 * 4,
        "dct_quant_recon": 6 * 720 * 1280 * 1.5 * 4,    # f32 passes
    }
    for k, nbytes in sol_bytes.items():
        if isinstance(out["ms"].get(k), (int, float)):
            sol_ms = nbytes / bw * 1e3
            out["roofline"][k] = {
                "sol_ms": round(sol_ms, 4),
                "x_of_sol": round(out["ms"][k] / sol_ms, 1)}
    return out


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        leg = {"probe": _leg_probe, "kernel": _leg_kernel,
               "e2e": _leg_e2e, "stages": _leg_stages}[sys.argv[2]]
        try:
            print(json.dumps(leg()))
        except Exception as exc:  # noqa: BLE001 — report, don't crash
            print(json.dumps({"fps": 0.0,
                              "error": f"{type(exc).__name__}: {exc}"[:500]}))
        sys.exit(0)
    main()
