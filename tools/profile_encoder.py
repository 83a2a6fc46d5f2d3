"""Stage-level device profiler for the MPEG-4 encoder P pass (720p).

Times the encoder's device stages in isolation with the chained-
dispatch method (tunnel RTT amortized): integer full search, Pallas
half-pel refine+MC, and the transform/quant/sparsify remainder.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _force(out):
    """Force execution on the axon tunnel: block_until_ready does NOT
    execute there — fetch a scalar from the last enqueued program (the
    device runs programs in order, so this drains the whole chain)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))


def _t(fn, reps=6, chain=8):
    _force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(chain)]
        _force(outs[-1])
        ts.append((time.perf_counter() - t0) * 1e3 / chain)
    return round(statistics.median(ts), 3)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from librempeg_tpu.codecs.mpeg4 import encoder as ME
    from librempeg_tpu.codecs.mpeg4 import me_pallas as MEP
    from librempeg_tpu.ops import motion
    from librempeg_tpu.utils import testgen

    h, w = 720, 1280
    y0, u0, v0 = testgen.video_yuv420(w, h, 0)
    y1, u1, v1 = testgen.video_yuv420(w, h, 1)
    y = jnp.asarray(y0, jnp.float32)
    u = jnp.asarray(u0, jnp.float32)
    v = jnp.asarray(v0, jnp.float32)
    ry = jnp.asarray(y1, jnp.float32)
    ru = jnp.asarray(u1, jnp.float32)
    rv = jnp.asarray(v1, jnp.float32)
    q = jnp.float32(8.0)

    res = {}
    caps = (4096, 512)
    res["encode_p_total"] = _t(lambda: ME._encode_p_packed(
        y, u, v, ry, ru, rv, q, 8, False, cap=caps[0], ecap=caps[1],
        trellis=False, pallas_mc=True))

    fs = jax.jit(lambda a, b: motion.full_search_mc_xla(a, b, 8, 16, 2))
    res["full_search"] = _t(lambda: fs(y[None], ry[None]))
    mv_i, _, _ = fs(y[None], ry[None])
    mv_i0 = mv_i[0]

    hp = jax.jit(lambda cy, a, b, c, m: MEP.hpel_refine_mc(
        cy, a, b, c, m, rnd=0))
    res["hpel_refine_mc"] = _t(lambda: hp(y, ry, ru, rv, mv_i0))

    # transform/quant/recon/sparsify remainder with fixed prediction
    mvh, py, pu, pv = hp(y, ry, ru, rv, mv_i0)

    from librempeg_tpu.codecs.mpeg4 import tables as T
    from librempeg_tpu.ops import dct8x8

    @jax.jit
    def resid(y, u, v, py, pu, pv, q, mvh):
        out = []
        for plane, pred in ((y, py), (u, pu), (v, pv)):
            rs = plane - pred
            coeffs = ME._fdct_spec(dct8x8.to_blocks(rs))
            level, rec = ME._quant_inter(coeffs, q)
            zz = level.reshape(-1, 64)[:, jnp.asarray(T.ZIGZAG)] \
                .astype(jnp.int16)
            recon = jnp.clip(pred + dct8x8.from_blocks(
                rec, plane.shape[0], plane.shape[1]), 0, 255)
            out.append((zz, recon))
        zzb = jnp.concatenate([o[0] for o in out])
        parts = ME._sparsify_fat(zzb, caps[0], caps[1])
        parts += [mvh.ravel().astype(jnp.int16)]
        return jnp.concatenate(parts), tuple(o[1] for o in out)

    res["dct_quant_sparsify"] = _t(
        lambda: resid(y, u, v, py, pu, pv, q, mvh))

    # finer split: transform+quant+recon WITHOUT the compaction, and
    # the two sparsify programs alone on a fixed coefficient tensor
    @jax.jit
    def dct_only(y, u, v, py, pu, pv, q):
        out = []
        for plane, pred in ((y, py), (u, pu), (v, pv)):
            rs = plane - pred
            coeffs = ME._fdct_spec(dct8x8.to_blocks(rs))
            level, rec = ME._quant_inter(coeffs, q)
            zz = level.reshape(-1, 64)[:, jnp.asarray(T.ZIGZAG)] \
                .astype(jnp.int16)
            recon = jnp.clip(pred + dct8x8.from_blocks(
                rec, plane.shape[0], plane.shape[1]), 0, 255)
            out.append((zz, recon))
        return jnp.concatenate([o[0] for o in out]), \
            tuple(o[1] for o in out)

    res["dct_quant_recon"] = _t(lambda: dct_only(y, u, v, py, pu, pv, q))
    zzb, _ = dct_only(y, u, v, py, pu, pv, q)
    sf = jax.jit(lambda z: jnp.concatenate(
        ME._sparsify_fat(z, caps[0], caps[1])))
    res["sparsify_fat"] = _t(lambda: sf(zzb))
    ss = jax.jit(lambda z: jnp.concatenate(ME._sparsify_slim(z)))
    res["sparsify_slim"] = _t(lambda: ss(zzb))

    # ablation: total with XLA-gather MC instead of pallas
    res["encode_p_xla_mc"] = _t(lambda: ME._encode_p_packed(
        y, u, v, ry, ru, rv, q, 8, False, cap=caps[0], ecap=caps[1],
        trellis=False, pallas_mc=False))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
