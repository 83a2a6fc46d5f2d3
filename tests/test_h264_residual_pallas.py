"""Bit-exactness of the Pallas residual kernel (residual_pallas.
expand_residual) against the XLA reference path (device_recon.
_residuals) on randomized sparse coefficients, all QPs, both MB kinds.
"""
import numpy as np
import pytest

from librempeg_tpu.codecs.h264 import device_recon as DR
from librempeg_tpu.codecs.h264 import residual_pallas as RP


def _random_coeffs(rng, nmb, qp, density=0.008, chroma_qp_off=0):
    """Sparse random levels bounded so dequantized values respect the
    spec's 16-bit range (8.5.12.1) — real streams are clipped there."""
    co = np.zeros((nmb, 27, 16), np.int32)
    mask = rng.random(co.shape) < density
    co[mask] = rng.integers(-512, 513, mask.sum())
    co[:, 17:19, 4:] = 0          # chroma DC rows carry 4 coeffs
    co[rng.random(nmb) < 0.3] = 0  # a share of fully-skipped MBs
    qpc = DR._CQP[np.clip(qp + chroma_qp_off, 0, 51)]
    for q, rows in ((qp, slice(0, 17)), (qpc, slice(17, 27))):
        scale = DR._VPOS[q % 6].max(axis=1) << (q // 6)   # [nmb]
        amp = np.maximum(32767 // scale, 1)
        co[:, rows, :] = np.clip(co[:, rows, :],
                                 -amp[:, None, None], amp[:, None, None])
    return co


def _spatial_from_reference(co, qp, kind, chroma_qp_off, nmb):
    import jax.numpy as jnp
    lres, cres = DR._residuals(jnp.asarray(co), jnp.asarray(qp),
                               chroma_qp_off, nmb,
                               is_i16=jnp.asarray(kind) == 3)
    lres = np.asarray(lres)        # [nmb,16,4,4]
    cres = np.asarray(cres)        # [nmb,2,2,2,4,4]
    out = np.zeros((nmb, 384), np.int32)
    luma = out[:, :256].reshape(nmb, 16, 16)
    for b in range(16):
        by, bx = b // 4, b % 4
        luma[:, by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = lres[:, b]
    for p in range(2):
        ch = out[:, 256 + 64 * p:320 + 64 * p].reshape(nmb, 8, 8)
        for by in range(2):
            for bx in range(2):
                ch[:, by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    cres[:, p, by, bx]
    return out


@pytest.mark.parametrize("qp_lo,qp_hi", [(0, 20), (20, 40), (40, 52)])
def test_expand_residual_bit_exact(qp_lo, qp_hi):
    rng = np.random.default_rng(qp_lo)
    mb_w, mb_h = 30, 5             # 150 MBs: crosses a stripe boundary
    nmb = mb_w * mb_h
    qp = rng.integers(qp_lo, qp_hi, nmb).astype(np.int32)
    co = _random_coeffs(rng, nmb, qp)
    kind = rng.integers(0, 4, nmb).astype(np.int32)
    packed, offw, ok = RP.pack_residual_host(co, qp, kind, 0, mb_w, mb_h)
    assert ok
    got = np.asarray(RP.expand_residual(packed, offw, nmb))[:nmb]
    want = _spatial_from_reference(co, qp, kind, 0, nmb)
    bad = np.nonzero(got.astype(np.int64) != want)
    assert bad[0].size == 0, (
        f"{bad[0].size} mismatches, first at mb={bad[0][0]} "
        f"col={bad[1][0]}: got {got[bad][0]} want {want[bad][0]}")


def test_expand_residual_dense_overflow():
    rng = np.random.default_rng(7)
    mb_w, mb_h = 120, 2
    nmb = mb_w * mb_h
    qp = np.full(nmb, 26, np.int32)
    co = _random_coeffs(rng, nmb, qp, density=0.9)   # every block coded
    kind = np.zeros(nmb, np.int32)
    packed, offw, ok = RP.pack_residual_host(co, qp, kind, 0, mb_w, mb_h)
    assert not ok                  # stripe window overflow signalled


def test_expand_residual_chroma_qp_offset():
    rng = np.random.default_rng(3)
    mb_w, mb_h = 8, 4
    nmb = mb_w * mb_h
    qp = rng.integers(10, 45, nmb).astype(np.int32)
    co = _random_coeffs(rng, nmb, qp, density=0.01, chroma_qp_off=4)
    kind = np.full(nmb, 3, np.int32)             # all Intra_16x16
    packed, offw, ok = RP.pack_residual_host(co, qp, kind, 4, mb_w, mb_h)
    assert ok
    got = np.asarray(RP.expand_residual(packed, offw, nmb))[:nmb]
    want = _spatial_from_reference(co, qp, kind, 4, nmb)
    assert np.array_equal(got.astype(np.int64), want)
