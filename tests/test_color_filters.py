"""lut3d / lut1d / colorspace filters.

No reference binary cross-check (the refbuild excludes these filters);
the tests assert the mathematical invariants that pin the
implementation: identity LUTs are no-ops, LUT lattice points map
exactly under every interpolator, an inverting LUT inverts, gray stays
gray under primaries adaptation (shared D65 white), and
bt601<->bt709 roundtrips return to the start. Behavioral reference:
libavfilter/vf_lut3d.c, vf_colorspace.c, libswscale/csputils.c.
"""
import numpy as np
import pytest

import librempeg_tpu.filters.registry  # noqa: F401
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.rational import Rational
from librempeg_tpu.filters.color import (
    parse_cube,
    primaries_matrix,
    rgb_to_xyz_matrix,
)
from librempeg_tpu.filters.filter import _FILTERS, StreamProps


def _rgb_frame(w=32, h=24, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    return VideoFrame(planes=(p,), format="rgb24", width=w, height=h,
                      pts=0, time_base=Rational(1, 25))


def _yuv_frame(fmt="yuv444p", w=32, h=24, seed=1):
    """In-gamut YUV built from random RGB with the spec bt709 matrix
    (out-of-gamut YUV cannot survive an RGB-domain roundtrip)."""
    rng = np.random.default_rng(seed)
    if fmt == "yuv420p":
        # constant 2x2 blocks: chroma point-sampling in the test and
        # box-average re-subsampling in the filter then agree
        rgb = np.repeat(np.repeat(rng.random((h // 2, w // 2, 3)),
                                  2, 0), 2, 1)
    else:
        rgb = rng.random((h, w, 3))
    kr, kb = 0.2126, 0.0722
    yy = kr * rgb[..., 0] + (1 - kr - kb) * rgb[..., 1] \
        + kb * rgb[..., 2]
    uu = (rgb[..., 2] - yy) / (2 * (1 - kb))
    vv = (rgb[..., 0] - yy) / (2 * (1 - kr))
    y = np.clip(16 + 219 * yy + 0.5, 0, 255).astype(np.uint8)
    u = np.clip(128 + 224 * uu + 0.5, 0, 255).astype(np.uint8)
    v = np.clip(128 + 224 * vv + 0.5, 0, 255).astype(np.uint8)
    if fmt == "yuv420p":
        u = u[0::2, 0::2]
        v = v[0::2, 0::2]
    return VideoFrame(planes=(y, u, v), format=fmt, width=w, height=h,
                      pts=0, time_base=Rational(1, 25))


def _run(f, frame):
    f.configure([StreamProps(media="video", width=frame.width,
                             height=frame.height,
                             pix_fmt=frame.format)])
    return f.filter_frame(frame)[0][1]


def _identity_cube(path, n=5):
    with open(path, "w") as fh:
        fh.write(f"LUT_3D_SIZE {n}\n")
        for b in range(n):
            for g in range(n):
                for r in range(n):
                    fh.write(f"{r/(n-1):.6f} {g/(n-1):.6f} "
                             f"{b/(n-1):.6f}\n")


@pytest.mark.parametrize("interp",
                         ["nearest", "trilinear", "tetrahedral"])
def test_lut3d_identity(tmp_path, interp):
    cube = tmp_path / "id.cube"
    _identity_cube(str(cube), 9)
    f = _FILTERS["lut3d"](file=str(cube), interp=interp)
    fr = _rgb_frame()
    out = np.asarray(_run(f, fr).planes[0])
    err = np.abs(out.astype(int) - np.asarray(fr.planes[0]).astype(int))
    if interp == "nearest":
        assert err.max() <= 16        # quantized to the 9^3 lattice
    else:
        assert err.max() <= 1


def test_lut3d_invert(tmp_path):
    n = 5
    cube = tmp_path / "inv.cube"
    with open(cube, "w") as fh:
        fh.write(f"LUT_3D_SIZE {n}\n")
        for b in range(n):
            for g in range(n):
                for r in range(n):
                    fh.write(f"{1-r/(n-1):.6f} {1-g/(n-1):.6f} "
                             f"{1-b/(n-1):.6f}\n")
    f = _FILTERS["lut3d"](file=str(cube))
    fr = _rgb_frame()
    out = np.asarray(_run(f, fr).planes[0])
    err = np.abs(out.astype(int)
                 - (255 - np.asarray(fr.planes[0]).astype(int)))
    assert err.max() <= 1


def test_lut3d_lattice_exact(tmp_path):
    """Interpolators agree exactly on lattice points of the LUT."""
    rng = np.random.default_rng(7)
    n = 4
    cube = tmp_path / "r.cube"
    with open(cube, "w") as fh:
        fh.write(f"LUT_3D_SIZE {n}\n")
        for _ in range(n ** 3):
            fh.write("%.6f %.6f %.6f\n" % tuple(rng.random(3)))
    table, _, _ = parse_cube(str(cube))
    # pixels exactly on lattice: value k*255/(n-1) rounds to/from the
    # same lattice coordinate only when divisible -> use k*85 for n=4
    vals = np.array([0, 85, 170, 255], np.uint8)
    plane = np.stack(np.meshgrid(vals, vals, vals, indexing="ij"),
                     axis=-1).reshape(8, 8, 3)
    fr = VideoFrame(planes=(plane,), format="rgb24", width=8, height=8,
                    pts=0, time_base=Rational(1, 25))
    outs = {}
    for interp in ("trilinear", "tetrahedral"):
        f = _FILTERS["lut3d"](file=str(cube), interp=interp)
        outs[interp] = np.asarray(_run(f, fr).planes[0])
    assert np.array_equal(outs["trilinear"], outs["tetrahedral"])
    # and match the table directly
    idx = plane[..., 0] // 85, plane[..., 1] // 85, plane[..., 2] // 85
    want = np.clip(np.floor(
        table[idx[2], idx[1], idx[0]] * 255 + 0.5), 0, 255)
    assert np.abs(outs["trilinear"].astype(int)
                  - want.astype(int)).max() <= 1


def test_lut1d(tmp_path):
    cube = tmp_path / "g.cube"
    n = 17
    with open(cube, "w") as fh:
        fh.write(f"LUT_1D_SIZE {n}\n")
        for i in range(n):
            v = (i / (n - 1)) ** 2.0          # gamma curve
            fh.write(f"{v:.6f} {v:.6f} {v:.6f}\n")
    f = _FILTERS["lut1d"](file=str(cube))
    fr = _rgb_frame()
    out = np.asarray(_run(f, fr).planes[0]).astype(np.float64)
    x = np.asarray(fr.planes[0]).astype(np.float64) / 255.0
    # piecewise-linear approx of x^2 on 17 knots: within ~2 codes
    assert np.abs(out - 255.0 * x ** 2).max() <= 3.0


def test_primaries_matrix_properties():
    # white (R=G=B=1) maps to white for any pair (shared D65)
    for a in ("bt709", "smpte170m", "bt470bg", "bt2020"):
        for b in ("bt709", "bt2020"):
            m = primaries_matrix(a, b)
            assert np.allclose(m @ np.ones(3), np.ones(3), atol=1e-10)
    # bt709 luminance row of RGB->XYZ is the bt709 luma vector
    xyz = rgb_to_xyz_matrix("bt709")
    assert np.allclose(xyz[1], [0.2126, 0.7152, 0.0722], atol=5e-5)


@pytest.mark.parametrize("fmt", ["yuv444p", "yuv420p"])
def test_colorspace_identity_and_roundtrip(fmt):
    fr = _yuv_frame(fmt)
    f_id = _FILTERS["colorspace"](all="bt709")
    out = _run(f_id, fr)
    for a, b in zip(out.planes, fr.planes):
        d = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
        assert d.max() <= 2, d.max()          # identity (quantization)

    f_ab = _FILTERS["colorspace"](all="bt601-6-625")
    f_ba = _FILTERS["colorspace"](all="bt709", ispace="bt470bg",
                                  itrc="smpte170m",
                                  iprimaries="bt470bg")
    mid = _run(f_ab, fr)
    back = _run(f_ba, mid)
    d = np.abs(np.asarray(back.planes[0]).astype(int)
               - np.asarray(fr.planes[0]).astype(int))
    assert np.mean(d) < 1.5 and d.max() <= 14   # roundtrip near-id


def test_colorspace_moves_colors():
    """bt2020 -> bt709 must change saturated colors but keep gray."""
    y = np.full((8, 8), 128, np.uint8)
    u = np.full((8, 8), 128, np.uint8)
    v = np.full((8, 8), 128, np.uint8)
    gray = VideoFrame(planes=(y, u, v), format="yuv444p", width=8,
                      height=8, pts=0, time_base=Rational(1, 25))
    f = _FILTERS["colorspace"](all="bt709", ispace="bt2020",
                               itrc="bt2020", iprimaries="bt2020")
    out = _run(f, gray)
    assert abs(int(np.asarray(out.planes[1])[0, 0]) - 128) <= 1
    assert abs(int(np.asarray(out.planes[2])[0, 0]) - 128) <= 1
    sat = VideoFrame(planes=(y, np.full((8, 8), 90, np.uint8),
                             np.full((8, 8), 220, np.uint8)),
                     format="yuv444p", width=8, height=8, pts=0,
                     time_base=Rational(1, 25))
    out2 = _run(f, sat)
    assert not np.array_equal(np.asarray(out2.planes[2]),
                              np.asarray(sat.planes[2]))
