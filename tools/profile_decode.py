"""Per-program device profiler for the flagship 1080p transcode.

Captures the REAL arguments of each device program while running the
committed bench asset through the product path (decode -> scale ->
encode), then times every program and its ablations in isolation with
block_until_ready medians. This is the checkasm --bench analog for the
TPU build (reference tests/checkasm/checkasm.c:1001): per-kernel
wall-clock on real data, not synthetic shapes.

Usage:  python tools/profile_decode.py [--frames N] [--reps R]
Prints one JSON dict of stage -> median ms.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time_call(fn, reps=12, chain=8):
    """Median per-call ms with the tunnel round-trip amortized: each
    sample dispatches `chain` identical calls back-to-back and blocks
    once (device executes them serially; dispatch/fetch latency is paid
    once per chain, not per call)."""
    import jax
    import jax.numpy as jnp

    def force(out):
        # axon tunnel: block_until_ready does not execute; fetch a
        # scalar from the LAST program (device executes in order)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))

    force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(chain)]
        force(outs[-1])
        dt1 = time.perf_counter() - t0
        ts.append(dt1 * 1e3 / chain)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from librempeg_tpu.codecs.h264 import decode_step as DS
    from librempeg_tpu.codecs.mpeg4 import encoder as ME

    cap: dict = {}
    orig_dec = DS.decode_p_step
    orig_enc = ME._encode_p_packed

    def dec_spy(*a, **k):
        if "dec" not in cap and k.get("do_deblock", True) \
                and (len(a) < 12 or a[11]):
            cap["dec"] = (a, dict(k))
        cap["dec_last"] = (a, dict(k))
        return orig_dec(*a, **k)

    def enc_spy(*a, **k):
        cap.setdefault("enc", (a, dict(k)))
        return orig_enc(*a, **k)

    DS.decode_p_step = dec_spy
    ME._encode_p_packed = enc_spy

    from librempeg_tpu.sched.pipeline import (StreamMap, TranscodeSpec,
                                              Transcoder)

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
    for _ in range(args.frames):
        chain.send_packet(next(it), tc.mux)
    chain.sync()
    DS.decode_p_step = orig_dec
    ME._encode_p_packed = orig_enc

    res = {}
    if "dec" in cap:
        a, k = cap["dec"]
        # positional layout: buf, lt, ct, layout, mb_w, mb_h, cqo,
        # icap, nb, alpha_off, beta_off, do_deblock, make_ref
        def call(**over):
            kk = dict(k)
            aa = list(a)
            names = ("buf", "lt", "ct", "layout", "mb_w", "mb_h",
                     "chroma_qp_off", "icap", "nb", "alpha_off",
                     "beta_off", "do_deblock", "make_ref")
            kw = {n: v for n, v in zip(names, aa)}
            kw.update(kk)
            kw.update(over)
            return orig_dec(**kw)

        res["decode_full"] = _time_call(call, args.reps)
        res["decode_nodeblock"] = _time_call(
            lambda: call(do_deblock=False), args.reps)
        res["decode_noref"] = _time_call(
            lambda: call(do_deblock=False, make_ref=False), args.reps)
        res["decode_noicap"] = _time_call(
            lambda: call(icap=0), args.reps)
        names = ("buf", "lt", "ct", "layout", "mb_w", "mb_h",
                 "chroma_qp_off", "icap", "nb", "alpha_off",
                 "beta_off", "do_deblock", "make_ref")
        kw = {n: v for n, v in zip(names, list(a))}
        kw.update(k)
        res["_meta"] = {"icap": kw["icap"], "nb": kw["nb"],
                        "layout": list(kw["layout"]),
                        "mb": [kw["mb_w"], kw["mb_h"]]}

        # isolated deblock + refpack with real recon planes
        y, u, v, pack, tiles = call()
        import jax.numpy as jnp
        import numpy as np

        from librempeg_tpu.codecs.h264 import device_recon as DR
        from librempeg_tpu.codecs.h264 import mc_pallas as MC
        from librempeg_tpu.codecs.h264.deblock_pallas import (
            deblock_frame_pallas,
        )

        offs = np.cumsum((0,) + tuple(kw["layout"]))
        buf_np = np.asarray(kw["buf"])
        segs = [buf_np[offs[i]:offs[i + 1]] for i in range(len(offs) - 1)]
        nmb = kw["mb_w"] * kw["mb_h"]
        idx = jnp.asarray(segs[0].view(np.int32))
        vals = jnp.asarray(segs[1].view(np.int16))
        qp = jnp.asarray(segs[2].view(np.int32))
        kind = jnp.asarray(segs[3].view(np.int32))
        selA = jnp.asarray(segs[7].view(np.int32))
        selB = jnp.asarray(segs[8].view(np.int32))
        mv = jnp.asarray(segs[9].view(np.int16).reshape(nmb, 16, 2))
        ref = jnp.asarray(segs[10].view(np.int8).reshape(nmb, 4))
        yj, uj, vj = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        res["deblock_alone"] = _time_call(
            lambda: deblock_frame_pallas(
                yj, uj, vj, idx, vals, mv, ref, qp, kind,
                kw["mb_w"], kw["mb_h"], kw["chroma_qp_off"],
                kw["alpha_off"], kw["beta_off"]), args.reps)
        res["refpack_tile"] = _time_call(
            lambda: MC.tile_refpack(*DR.make_refpack(yj, uj, vj)),
            args.reps)
        res["mc_alone"] = _time_call(
            lambda: MC.mc_predict(kw["lt"], kw["ct"], selA, selB, nmb,
                                  kw["nb"]), args.reps)

    if "enc" in cap:
        a, k = cap["enc"]
        res["encode_p"] = _time_call(lambda: orig_enc(*a, **k),
                                     args.reps)
        kk = dict(k)
        res["_enc_meta"] = {"kw": {x: kk[x] for x in kk
                                   if not hasattr(kk[x], "shape")}}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
