"""Product-pipeline device mesh: the -mesh CLI flag's machinery.

Holds the session's active `jax.sharding.Mesh` and provides the
shard_map wrappers the real transcode pipeline uses: the MPEG-4
encoder's device pass sharded over row bands with a search-range halo
exchange (parallel/halo.py pattern on the production kernels), and the
scaler's vertical GEMM split over output rows. Both forms are
bit-identical to the single-device programs: per-macroblock compute is
band-local once the halo rows are present, and the output-row split
keeps every dot contraction at full input length.

Role analog: fftools/ffmpeg_sched.h:31-87 (the scheduler that spreads
the pipeline over workers) — here spread over TPU mesh devices with
XLA collectives instead of threads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_ACTIVE: Mesh | None = None


def parse_mesh_spec(spec: str) -> dict[str, int]:
    """'data=2,spatial=4' -> {'data': 2, 'spatial': 4}."""
    out = {}
    for part in spec.split(","):
        if not part.strip():
            continue
        k, _, v = part.partition("=")
        out[k.strip()] = int(v)
    if not out:
        raise ValueError(f"bad mesh spec: {spec!r}")
    return out


def make_mesh(spec: str) -> Mesh:
    axes = parse_mesh_spec(spec)
    n = int(np.prod(list(axes.values())))
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(
            f"mesh {spec!r} needs {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))


def set_active_mesh(mesh: Mesh | None) -> None:
    global _ACTIVE
    _ACTIVE = mesh


def active_mesh() -> Mesh | None:
    return _ACTIVE


def spatial_size(mesh: Mesh | None = None) -> int:
    m = mesh or _ACTIVE
    if m is None or "spatial" not in m.axis_names:
        return 1
    return m.shape["spatial"]


# ---------------------------------------------------------------------------
# sharded scaler: vertical resize with output rows split over 'spatial'
# ---------------------------------------------------------------------------

def resize_v_sharded(x, m: np.ndarray, mesh: Mesh):
    """[..., H, W] x [H', H] -> [..., H', W], H' split over 'spatial'.

    Full-length contractions per output row keep the fp reduction
    identical to the single-device GEMM (bit-identical outputs); the
    input is gathered once per frame, the output stays row-sharded.
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape["spatial"]
    dst = m.shape[0]
    if dst % n:
        from librempeg_tpu.ops.fir import resize_v

        return resize_v(x, m)
    mm = jnp.asarray(m, dtype=x.dtype)
    other = tuple(a for a in mesh.axis_names if a != "spatial")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("spatial")),
        out_specs=P(*([None] * (x.ndim - 2)), "spatial", None),
        check_rep=False)
    def step(xs, ms):
        return jnp.einsum("hk,...kw->...hw", ms, xs,
                          preferred_element_type=xs.dtype,
                          precision=jax.lax.Precision.HIGHEST)

    del other
    return step(x, mm)


# ---------------------------------------------------------------------------
# sharded MPEG-4 encode pass: row bands + search-range halo
# ---------------------------------------------------------------------------

def mpeg4_encode_p_sharded(y, u, v, ry, ru, rv, qscale,
                           search_range: int, mesh: Mesh):
    """The _encode_p_device pass over 'spatial' row bands.

    The current frame and references are split into MB-row bands; each
    device halo-exchanges `search_range` reference rows (the
    parallel/halo.py ppermute pattern), runs the full ME+transform+
    recon band-locally, and the block/mv/recon outputs concatenate
    back in raster order. Per-MB compute never crosses band+halo, so
    results are bit-identical to the single-device pass.
    """
    from jax.experimental.shard_map import shard_map

    from librempeg_tpu.codecs.mpeg4.encoder import (_fdct_spec,
                                                    _quant_inter)
    from librempeg_tpu.codecs.mpeg4 import tables as T
    from librempeg_tpu.ops import dct8x8, motion
    from librempeg_tpu.parallel.halo import exchange_row_halo

    sr = search_range
    zz_perm = jnp.asarray(np.asarray(T.ZIGZAG))

    def band(yb, ub, vb, ryb, rub, rvb, qs):
        from librempeg_tpu.codecs.mpeg4.encoder import _chroma_mv_dev

        yf = yb.astype(jnp.float32)[None]
        ry_h = exchange_row_halo(
            ryb.astype(jnp.float32)[None], sr + 2, "spatial")
        mv, _, pred_y = motion.full_search_mc_hpel_prepadded(
            yf, ry_h, sr, block_size=16, rounding=0, step=2)
        pred_y = pred_y[0]
        mv_c = _chroma_mv_dev(mv)
        rc = sr // 2 + 2
        ru_h = exchange_row_halo(
            rub.astype(jnp.float32)[None], rc, "spatial")
        rv_h = exchange_row_halo(
            rvb.astype(jnp.float32)[None], rc, "spatial")
        pred_u = motion.mc_hpel_vpad(ru_h, mv_c, 8, rc, rc, 0)[0]
        pred_v = motion.mc_hpel_vpad(rv_h, mv_c, 8, rc, rc, 0)[0]
        outs = [mv[0]]
        for plane, pred in ((yf[0], pred_y), (ub, pred_u),
                            (vb, pred_v)):
            p = plane.astype(jnp.float32)
            h, w = p.shape
            resid = p - pred
            coeffs = _fdct_spec(dct8x8.to_blocks(resid))
            level, rec_res = _quant_inter(coeffs, qs)
            zz = level.reshape(-1, 64)[:, zz_perm].astype(jnp.int16)
            recon = jnp.clip(
                pred + dct8x8.from_blocks(rec_res, h, w), 0, 255)
            outs.append(zz)
            outs.append(recon)
        return tuple(outs)

    sp = P("spatial", None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(sp, sp, sp, sp, sp, sp, P()),
        out_specs=(P("spatial", None, None), sp, sp, sp, sp, sp, sp),
        check_rep=False)
    def step(yb, ub, vb, ryb, rub, rvb, qs):
        return band(yb, ub, vb, ryb, rub, rvb, qs)

    mv, zzy, ry2, zzu, ru2, zzv, rv2 = step(
        y, u, v, ry, ru, rv, jnp.int32(qscale))
    return {"mv": mv, "y": (zzy, ry2), "u": (zzu, ru2),
            "v": (zzv, rv2)}
