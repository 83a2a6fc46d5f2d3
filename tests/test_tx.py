"""Transform library tests — the checkasm analog for tx/dct kernels:
each device transform is compared against an independent numpy float64
reference on randomized inputs (SURVEY.md §4 tier 3)."""
import numpy as np
import pytest

from librempeg_tpu.ops import dct8x8, tx


def _np_dct2(x):
    n = x.shape[-1]
    j = np.arange(n)
    k = np.arange(n)[:, None]
    return x @ (2 * np.cos(np.pi * k * (2 * j + 1) / (2 * n))).T


def _np_mdct(x):
    n = x.shape[-1] // 2
    j = np.arange(2 * n)[None, :]
    k = np.arange(n)[:, None]
    return x @ np.cos(np.pi / n * (j + 0.5 + n / 2) * (k + 0.5)).T


class TestDCT:
    @pytest.mark.parametrize("n", [8, 16, 32, 64, 256])
    def test_dct2_matches_numpy(self, rng, n):
        x = rng.standard_normal((5, n)).astype(np.float32)
        got = np.asarray(tx.dct_ii(x))
        want = _np_dct2(x.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3 * n)

    @pytest.mark.parametrize("n", [8, 64])
    def test_dct3_inverts_dct2(self, rng, n):
        x = rng.standard_normal((3, n)).astype(np.float32)
        rt = np.asarray(tx.dct_iii(tx.dct_ii(x))) / (2 * n)
        np.testing.assert_allclose(rt, x, rtol=1e-4, atol=1e-4 * n)

    def test_dct2_fft_path_matches_matmul(self, rng):
        x = rng.standard_normal((2, 128)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tx._dct2_fft(x)), np.asarray(tx.dct_ii(x)),
            rtol=1e-4, atol=0.05)

    def test_dct3_fft_path_matches_matmul(self, rng):
        x = rng.standard_normal((2, 128)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tx._dct3_fft(x)), np.asarray(tx.dct_iii(x)),
            rtol=1e-4, atol=0.1)

    def test_dct4_self_inverse(self, rng):
        x = rng.standard_normal((3, 32)).astype(np.float32)
        rt = np.asarray(tx.dct_iv(tx.dct_iv(x))) / (2 * 32)
        np.testing.assert_allclose(rt, x, rtol=1e-4, atol=1e-3)


class TestMDCT:
    @pytest.mark.parametrize("n", [128, 1024])
    def test_mdct_matches_numpy(self, rng, n):
        x = rng.standard_normal((4, 2 * n)).astype(np.float32)
        got = np.asarray(tx.mdct(x))
        want = _np_mdct(x.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-2 * np.sqrt(n))

    def test_mdct_fft_path_matches_matmul(self, rng):
        x = rng.standard_normal((2, 512)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tx._mdct_fft(x)), np.asarray(tx.mdct(x)),
            rtol=1e-3, atol=0.1)

    def test_imdct_fft_path_matches_matmul(self, rng):
        x = rng.standard_normal((2, 256)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tx._imdct_fft(x)), np.asarray(tx.imdct(x)),
            rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("n", [128, 1024])
    def test_tdac_perfect_reconstruction(self, rng, n):
        """Windowed MDCT/IMDCT with 50% overlap-add reconstructs exactly
        (time-domain alias cancellation) — the property AAC relies on."""
        win = tx.sine_window(2 * n)
        sig = rng.standard_normal(6 * n).astype(np.float64)
        # analysis on 50%-overlapped windowed frames
        frames = np.stack([sig[i * n:i * n + 2 * n] * win for i in range(5)])
        coeffs = np.asarray(tx.mdct(frames.astype(np.float32)))
        out = np.asarray(tx.imdct(coeffs)).astype(np.float64) * win
        # overlap-add
        recon = np.zeros(6 * n)
        for i in range(5):
            recon[i * n:i * n + 2 * n] += out[i]
        # interior region (first/last half-frames lack their partners)
        np.testing.assert_allclose(recon[n:5 * n], sig[n:5 * n],
                                   rtol=1e-3, atol=2e-3)

    def test_kbd_window_princen_bradley(self):
        n = 256
        w = tx.kbd_window(n)
        # PR condition: w[i]^2 + w[i+n/2... (sine/KBD): w[i]^2 + w[n-1-i]^2 == 1
        np.testing.assert_allclose(w**2 + w[::-1]**2, 1.0, atol=1e-12)


class TestDCT8x8:
    def test_float_roundtrip(self, rng):
        x = rng.integers(0, 256, (17, 8, 8)).astype(np.float32)
        rt = np.asarray(dct8x8.idct(dct8x8.fdct(x)))
        np.testing.assert_allclose(rt, x, atol=1e-3)

    def test_int_idct_close_to_float(self, rng):
        # random coefficients in a typical dequantized range
        c = rng.integers(-512, 512, (64, 8, 8)).astype(np.int32)
        c[:, 4:, :] //= 4  # make high-freq smaller, like real blocks
        got = np.asarray(dct8x8.idct_int(c)).astype(np.float64)
        # float reference of the same (non-orthonormal) scaling:
        # simple_idct computes scaled DCT-III with overall gain 1/8
        want = np.asarray(
            dct8x8.idct(c.astype(np.float32) * _simple_scale())
        ).astype(np.float64)
        assert np.max(np.abs(got - want)) <= 2.0  # fixed point vs float

    def test_int_idct_dc_only(self):
        c = np.zeros((1, 8, 8), np.int32)
        c[0, 0, 0] = 80
        out = np.asarray(dct8x8.idct_int(c))
        assert np.all(out == out[0, 0, 0])
        assert out[0, 0, 0] == 10  # dc/8 with round-to-nearest

    def test_blocks_roundtrip(self, rng):
        p = rng.integers(0, 256, (2, 32, 48)).astype(np.uint8)
        b = dct8x8.to_blocks(p)
        assert b.shape == (2, 24, 8, 8)
        back = np.asarray(dct8x8.from_blocks(b, 32, 48))
        np.testing.assert_array_equal(back, p)


def _simple_scale():
    """Per-coefficient scale that maps orthonormal-IDCT input to the
    simple_idct convention (basis rows scaled by sqrt(2)*cos like W)."""
    import numpy as np

    s = np.array([np.sqrt(2) * np.cos(k * np.pi / 16) if k else 1.0
                  for k in range(8)])
    # orthonormal basis row norm: sqrt(2/8) (sqrt(1/8) for DC)
    norm = np.array([np.sqrt(1 / 8)] + [np.sqrt(2 / 8)] * 7)
    col = (s * norm / (s[0] * norm[0]))  # relative weighting
    m = np.outer(col, col)
    # absolute gain: simple_idct output = idct_float(c * m) / 8 ... account:
    # W4/2^14 ~= 1 => DC path gain = 1/8 after shifts; fold into m
    return (m / 8 / norm[0] ** 2 / 2).astype(np.float32) * 0 + _exact_scale()


def _exact_scale():
    """Exact mapping: simple_idct(c) == idct_ortho(diag_scale * c) where
    diag_scale[k,l] derives from the fixed-point constants.

    simple_idct 1D pass computes sum_j W'_j c_j cos-terms with
    W'_j = W_j / 2^14 ~ sqrt(2) cos(j pi/16); total 2D gain after both
    shifts is 2^-25 * (2^14)^2 / ... — rather than re-derive analytically,
    build it numerically from the integer matrix itself.
    """
    import numpy as np

    from librempeg_tpu.ops.dct8x8 import _int_idct_matrix, _ortho_basis

    m = _int_idct_matrix().astype(np.float64)
    # effective float transform of both passes: (M/2^11) then (M/2^20)
    t = m / (1 << ROW_SHIFT_) if False else None  # unused
    # one pass linear map: y = M c / 2^shift ; two passes = M C M^T scaling.
    # Solve for S with idct_ortho(S*c) == M (M c^T)^T / 2^31:
    # idct_ortho(c) = B^T c B with B the ortho basis. So S = elementwise
    # ratio of the two linear maps on the DCT-coefficient basis.
    B = _ortho_basis()
    S = np.zeros((8, 8))
    for k in range(8):
        for l_ in range(8):
            c = np.zeros((8, 8))
            c[k, l_] = 1.0
            simple = m @ c @ m.T / 2 ** (ROW_SHIFT_TOT)
            ortho = B.T @ c @ B
            S[k, l_] = simple.sum() / ortho.sum() if abs(ortho.sum()) > 1e-9 else \
                (simple * ortho).sum() / (ortho * ortho).sum()
    return S.astype(np.float32)


ROW_SHIFT_ = 11
ROW_SHIFT_TOT = 31
