"""Bit-exactness of the Pallas half-pel ME/MC kernels vs the XLA
gather path (ops.motion._hpel_refine + mc_hpel) — the checkasm-style
kernel-vs-reference contract (SURVEY.md §4.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from librempeg_tpu.codecs.mpeg4 import me_pallas as MEP
from librempeg_tpu.ops import motion


def _xla_path(cur_y, ref_y, ref_u, ref_v, mv_i, rnd=0, sr=8):
    pad = sr + 2
    ref_pad = jnp.pad(ref_y.astype(jnp.int32)[None],
                      ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    mvh, _, pred_y = motion._hpel_refine(cur_y[None], ref_pad, pad, pad,
                                         mv_i[None], rnd, 16)
    mv_c = jnp.sign(mvh) * ((jnp.abs(mvh) >> 1) | (jnp.abs(mvh) & 1))
    cpad = sr // 2 + 2
    pu = motion.mc_hpel(ref_u.astype(jnp.float32)[None], mv_c, 8,
                        cpad, rnd)[0]
    pv = motion.mc_hpel(ref_v.astype(jnp.float32)[None], mv_c, 8,
                        cpad, rnd)[0]
    return mvh[0], pred_y[0], pu, pv


@pytest.mark.parametrize("seed", [0, 1])
def test_hpel_refine_mc_bit_exact(seed):
    rng = np.random.default_rng(seed)
    h, w = 64, 256
    cur_y = rng.integers(0, 256, (h, w)).astype(np.float32)
    # reference = shifted noisy copy so the search has real winners
    ref_y = np.roll(cur_y, (rng.integers(-3, 4), rng.integers(-3, 4)),
                    (0, 1))
    ref_y = np.clip(ref_y + rng.integers(-2, 3, (h, w)), 0, 255) \
        .astype(np.float32)
    ref_u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.float32)
    ref_v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.float32)
    mv_i = rng.integers(-8, 9, (h // 16, w // 16, 2)).astype(np.int32)
    # integer search uses an even lattice (step=2)
    mv_i = (mv_i // 2) * 2

    mvh_p, py_p, pu_p, pv_p = MEP.hpel_refine_mc(
        jnp.asarray(cur_y), jnp.asarray(ref_y), jnp.asarray(ref_u),
        jnp.asarray(ref_v), jnp.asarray(mv_i), rnd=0, interpret=True)
    mvh_x, py_x, pu_x, pv_x = _xla_path(
        jnp.asarray(cur_y), jnp.asarray(ref_y), jnp.asarray(ref_u),
        jnp.asarray(ref_v), jnp.asarray(mv_i))

    np.testing.assert_array_equal(np.asarray(mvh_p), np.asarray(mvh_x))
    np.testing.assert_array_equal(np.asarray(py_p), np.asarray(py_x))
    np.testing.assert_array_equal(np.asarray(pu_p), np.asarray(pu_x))
    np.testing.assert_array_equal(np.asarray(pv_p), np.asarray(pv_x))
