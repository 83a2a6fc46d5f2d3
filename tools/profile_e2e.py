"""Per-stage device profiling of the flagship e2e transcode.

Runs the bench asset (assets/bench_1080p.264 -> scale 720p -> mpeg4)
exactly like bench.py's e2e leg, capturing the arguments of the hot
jitted device programs via monkeypatch, then times each program (and
ablated variants) in isolation with captured args.  This is the
NEXT.md "captured-args" profiling pattern: far cheaper than full e2e
reruns when iterating on one kernel.

Usage:  python tools/profile_e2e.py [stages|decode|encode|all]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("LIBREMPEG_TIMING", "1")


def _jax_setup():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    return jax


def _fetch(out):
    """Force execution: pull one scalar from an arbitrary pytree."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    return float(jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32))


def _time_fn(label, fn, iters=8):
    _fetch(fn())                       # compile + warm
    _fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:42s} {dt * 1e3:8.2f} ms")
    return dt


def _run_e2e(n_warm=8, n_meas=16, capture=None):
    """Run the transcode loop; `capture` is a dict of
    {module_attr_path: hook} monkeypatches applied before the loop."""
    import tempfile

    from librempeg_tpu.sched.pipeline import (StreamMap, TranscodeSpec,
                                              Transcoder)
    from librempeg_tpu.utils import stagetimer

    asset = os.path.join(REPO, "assets", "bench_1080p.264")
    out = os.path.join(tempfile.gettempdir(), "prof_e2e.avi")
    spec = TranscodeSpec(
        input_url=asset, output_url=out,
        video=StreamMap(codec="mpeg4",
                        codec_opts={"bit_rate": 4_000_000},
                        width=1280, height=720))
    tc = Transcoder(spec)
    it = tc.demux.packets()
    chain = tc.chains[0]
    for _ in range(n_warm):
        chain.send_packet(next(it), tc.mux)
    chain.sync()
    stagetimer.reset()
    t0 = time.perf_counter()
    for _ in range(n_meas):
        chain.send_packet(next(it), tc.mux)
    chain.sync()
    dt = time.perf_counter() - t0
    print(f"e2e steady-state: {n_meas / dt:.2f} fps "
          f"({dt / n_meas * 1e3:.1f} ms/frame)")
    rep = stagetimer.report()
    for k, v in rep.items():
        print(f"  {k:32s} {v['s'] / max(v['n'], 1) * 1e3:8.2f} ms/call"
              f"  x{v['n']}")
    return rep


def leg_stages():
    _jax_setup()
    print("== stage split (stagetimer, wall-clock incl host overlap) ==")
    _run_e2e()


def leg_decode():
    jax = _jax_setup()
    import jax.numpy as jnp

    from librempeg_tpu.codecs.h264 import decode_step as DS

    cap = {}
    orig = DS.decode_p_step

    def hook(buf, lt, ct, layout, *a, **kw):
        # keep the LAST deblocked+make_ref P frame's args
        if a[-1] and a[-2]:
            cap["args"] = (np.asarray(buf), lt, ct, layout) + a
        return orig(buf, lt, ct, layout, *a, **kw)

    import numpy as np

    DS.decode_p_step = hook
    _run_e2e(n_warm=6, n_meas=10)
    DS.decode_p_step = orig
    if "args" not in cap:
        print("no deblocked P frame captured!")
        return
    buf, lt, ct, layout, mb_w, mb_h, cqo, icap, nb, aoff, boff, dodb, \
        mkref = cap["args"]
    print(f"== decode_p_step captured: mb {mb_w}x{mb_h} icap={icap} "
          f"nb={nb} buf={buf.size} ==")
    bufj = jnp.asarray(buf)

    def step(icap=icap, dodb=True, mkref=True, nb=nb):
        return DS.decode_p_step(bufj, lt, ct, layout, mb_w, mb_h, cqo,
                                icap, nb, aoff, boff, dodb, mkref)

    full = _time_fn("full decode_p_step", step)
    nodb = _time_fn("  - no deblock", lambda: step(dodb=False))
    noi = _time_fn("  - no deblock, no intra",
                   lambda: step(dodb=False, icap=0))
    nom = _time_fn("  - no deblock/intra/ref",
                   lambda: step(dodb=False, icap=0, mkref=False))
    print(f"  => deblock ~{(full - nodb) * 1e3:.2f} ms, "
          f"intra ~{(nodb - noi) * 1e3:.2f} ms, "
          f"refpack ~{(noi - nom) * 1e3:.2f} ms, "
          f"mc+residual+upload ~{nom * 1e3:.2f} ms")

    # isolated kernels on the same data
    from librempeg_tpu.codecs.h264 import mc_pallas as MC

    nmb = mb_w * mb_h
    offs = np.cumsum((0,) + layout)
    segs = [buf[int(offs[i]):int(offs[i + 1])]
            for i in range(len(layout))]
    selA = jnp.asarray(segs[7].view(np.int32))
    selB = jnp.asarray(segs[8].view(np.int32))
    _time_fn("mc_predict alone",
             lambda: MC.mc_predict(lt, ct, selA, selB, nmb, nb))
    y = jnp.zeros((mb_h * 16, mb_w * 16), jnp.uint8)
    u = jnp.zeros((mb_h * 8, mb_w * 8), jnp.uint8)
    v = jnp.zeros((mb_h * 8, mb_w * 8), jnp.uint8)
    from librempeg_tpu.codecs.h264 import device_recon as DR

    _time_fn("make_refpack + tile",
             lambda: MC.tile_refpack(*DR.make_refpack(y, u, v)))
    from librempeg_tpu.codecs.h264.deblock_pallas import (
        deblock_frame_pallas,
    )

    idx = jnp.asarray(segs[0].view(np.int32))
    vals = jnp.asarray(segs[1].view(np.int16))
    qp = jnp.asarray(segs[2].view(np.int32))
    kind = jnp.asarray(segs[3].view(np.int32))
    mv = jnp.asarray(segs[9].view(np.int16).reshape(nmb, 16, 2))
    ref = jnp.asarray(segs[10].view(np.int8).reshape(nmb, 4))
    _time_fn("deblock_frame_pallas alone",
             lambda: deblock_frame_pallas(y, u, v, idx, vals, mv, ref,
                                          qp, kind, mb_w, mb_h, cqo,
                                          aoff, boff))
    np.save("/tmp/prof_decode_args.npy",
            np.array([buf], dtype=object), allow_pickle=True)
    with open("/tmp/prof_decode_meta.json", "w") as f:
        json.dump({"layout": list(layout), "mb_w": mb_w, "mb_h": mb_h,
                   "cqo": cqo, "icap": icap, "nb": nb, "aoff": aoff,
                   "boff": boff}, f)
    print("captured args saved to /tmp/prof_decode_args.npy")


def leg_encode():
    jax = _jax_setup()
    import jax.numpy as jnp
    import numpy as np

    from librempeg_tpu.codecs.mpeg4 import encoder as ENC

    cap = {}
    orig = ENC._encode_p_packed

    def hook(*a, **kw):
        cap["args"] = (a, kw)
        return orig(*a, **kw)

    ENC._encode_p_packed = hook
    _run_e2e(n_warm=6, n_meas=10)
    ENC._encode_p_packed = orig
    if "args" not in cap:
        print("no P encode captured!")
        return
    a, kw = cap["args"]
    print(f"== _encode_p_packed captured kw={kw} ==")
    _time_fn("_encode_p_packed full", lambda: ENC._encode_p_packed(
        *a, **kw))
    y, u, v, ry, ru, rv, qscale = a[:7]
    sr = a[7] if len(a) > 7 else kw.get("search_range", 8)

    def dev(pallas_mc=kw.get("pallas_mc", False)):
        return ENC._encode_p_device(y, u, v, ry, ru, rv, qscale, sr,
                                    kw.get("trellis", False), pallas_mc)

    _time_fn("  _encode_p_device (me+dct+quant+recon)", dev)

    from librempeg_tpu.ops import motion

    yf = jnp.asarray(y).astype(jnp.float32)[None]
    ryf = jnp.asarray(ry).astype(jnp.float32)[None]
    if kw.get("pallas_mc", False):
        from librempeg_tpu.codecs.mpeg4 import me_pallas as MEP

        _time_fn("  full_search_mc_xla (int ME)",
                 lambda: motion.full_search_mc_xla(yf, ryf, sr, 16, 2))
        mv_i = motion.full_search_mc_xla(yf, ryf, sr, 16, 2)[0]
        _time_fn("  hpel_refine_mc (pallas)",
                 lambda: MEP.hpel_refine_mc(yf[0], ry, ru, rv, mv_i[0],
                                            rnd=0))
    else:
        _time_fn("  full_search_mc_hpel",
                 lambda: motion.full_search_mc_hpel(yf, ryf, sr, 16, 0,
                                                    2))


def leg_scale():
    _jax_setup()
    import numpy as np
    import jax.numpy as jnp

    from librempeg_tpu.filters import GraphRunner, StreamProps
    from librempeg_tpu.core.frame import VideoFrame
    from librempeg_tpu.core.rational import Rational

    props = StreamProps(media="video", width=1920, height=1080,
                        pix_fmt="yuv420p", frame_rate=Rational(25, 1),
                        time_base=Rational(1, 25))
    g = GraphRunner("scale=1280:720", props)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (540, 960), np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (540, 960), np.uint8))
    fr = VideoFrame(planes=(y, u, v), format="yuv420p", width=1920,
                    height=1080, pts=0, time_base=Rational(1, 25))

    def run():
        outs = g.push(fr)
        return outs[0].planes

    _time_fn("scale 1080p->720p (graph push)", run)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stages", "all"):
        leg_stages()
    if which in ("decode", "all"):
        leg_decode()
    if which in ("encode", "all"):
        leg_encode()
    if which in ("scale", "all"):
        leg_scale()
