"""Build & load the native host extension (ctypes).

Compiles bitstream.cpp to a shared library on first import (cached by
source mtime) and exposes typed wrappers. The native layer is optional:
callers check `available()` and can fall back to pure-Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bitstream.cpp")
_LIB = os.path.join(_DIR, "_bitstream.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-march=native",
             "-o", _LIB, _SRC],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import sys

        print(f"native build failed: {e}", file=sys.stderr)
        return False


def get() -> ctypes.CDLL | None:
    """The loaded library, building if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        need_build = (not os.path.exists(_LIB)
                      or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if need_build and not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.jpeg_decode_scan.restype = ctypes.c_int
        lib.jpeg_decode_scan.argtypes = [
            u8p, ctypes.c_int,
            ctypes.c_int, i32p, i32p, i32p, i32p,
            u8p, u8p, i32p, u8p, u8p, i32p,
            ctypes.c_int, ctypes.c_int, i16p]
        lib.jpeg_encode_scan.restype = ctypes.c_int
        lib.jpeg_encode_scan.argtypes = [
            i16p, ctypes.c_int,
            ctypes.c_int, i32p, i32p, i32p, i32p,
            u8p, u8p, i32p, u8p, u8p, i32p,
            u8p, ctypes.c_int]
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, u8p]
        lib.png_filter.restype = ctypes.c_int
        lib.png_filter.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.biquad.restype = ctypes.c_int
        lib.biquad.argtypes = [f64p, f64p, f32p, f32p, ctypes.c_long]
        _lib = lib
        return _lib


def available() -> bool:
    return get() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i16(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def jpeg_decode_scan(data: bytes, comps: list[dict],
                     dc_tables: list[tuple[np.ndarray, np.ndarray]],
                     ac_tables: list[tuple[np.ndarray, np.ndarray]],
                     mcu_count: int, restart_interval: int) -> np.ndarray:
    """Decode a baseline scan -> [total_blocks, 64] int16 (zigzag order).

    comps: [{"h":, "v":, "dc":, "ac":}]; tables: (bits[16], vals[<=256]).
    """
    lib = get()
    assert lib is not None
    ncomp = len(comps)
    ch = np.array([c["h"] for c in comps], np.int32)
    cv = np.array([c["v"] for c in comps], np.int32)
    cd = np.array([c["dc"] for c in comps], np.int32)
    ca = np.array([c["ac"] for c in comps], np.int32)
    dc_bits = np.zeros((4, 16), np.uint8)
    dc_vals = np.zeros((4, 256), np.uint8)
    dc_n = np.zeros(4, np.int32)
    ac_bits = np.zeros((4, 16), np.uint8)
    ac_vals = np.zeros((4, 256), np.uint8)
    ac_n = np.zeros(4, np.int32)
    for i, (b, v) in enumerate(dc_tables):
        dc_bits[i, :len(b)] = b
        dc_vals[i, :len(v)] = v
        dc_n[i] = len(v)
    for i, (b, v) in enumerate(ac_tables):
        ac_bits[i, :len(b)] = b
        ac_vals[i, :len(v)] = v
        ac_n[i] = len(v)
    blocks_per_mcu = int(sum(c["h"] * c["v"] for c in comps))
    out = np.zeros((mcu_count * blocks_per_mcu, 64), np.int16)
    buf = np.frombuffer(data, np.uint8)
    r = lib.jpeg_decode_scan(
        _u8(buf), len(data), ncomp, _i32(ch), _i32(cv), _i32(cd), _i32(ca),
        _u8(dc_bits), _u8(dc_vals), _i32(dc_n),
        _u8(ac_bits), _u8(ac_vals), _i32(ac_n),
        mcu_count, restart_interval, _i16(out))
    if r < 0:
        from librempeg_tpu.core.errors import InvalidData

        raise InvalidData("JPEG scan decode failed")
    return out


def jpeg_encode_scan(coeffs: np.ndarray, comps: list[dict],
                     dc_tables, ac_tables, mcu_count: int) -> bytes:
    """[total_blocks, 64] int16 zigzag -> entropy-coded bytes."""
    lib = get()
    assert lib is not None
    ncomp = len(comps)
    ch = np.array([c["h"] for c in comps], np.int32)
    cv = np.array([c["v"] for c in comps], np.int32)
    cd = np.array([c["dc"] for c in comps], np.int32)
    ca = np.array([c["ac"] for c in comps], np.int32)
    dc_bits = np.zeros((4, 16), np.uint8)
    dc_vals = np.zeros((4, 256), np.uint8)
    dc_n = np.zeros(4, np.int32)
    ac_bits = np.zeros((4, 16), np.uint8)
    ac_vals = np.zeros((4, 256), np.uint8)
    ac_n = np.zeros(4, np.int32)
    for i, (b, v) in enumerate(dc_tables):
        dc_bits[i, :len(b)] = b
        dc_vals[i, :len(v)] = v
        dc_n[i] = len(v)
    for i, (b, v) in enumerate(ac_tables):
        ac_bits[i, :len(b)] = b
        ac_vals[i, :len(v)] = v
        ac_n[i] = len(v)
    coeffs = np.ascontiguousarray(coeffs, np.int16)
    cap = coeffs.size * 4 + 65536
    out = np.zeros(cap, np.uint8)
    n = lib.jpeg_encode_scan(
        _i16(coeffs), mcu_count, ncomp, _i32(ch), _i32(cv), _i32(cd),
        _i32(ca),
        _u8(dc_bits), _u8(dc_vals), _i32(dc_n),
        _u8(ac_bits), _u8(ac_vals), _i32(ac_n),
        _u8(out), cap)
    if n < 0:
        raise RuntimeError("JPEG scan encode overflow")
    return out[:n].tobytes()


def png_unfilter(rows: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    lib = get()
    assert lib is not None
    rows_a = np.frombuffer(rows, np.uint8)
    out = np.zeros(h * stride, np.uint8)
    r = lib.png_unfilter(_u8(rows_a), h, stride, bpp, _u8(out))
    if r < 0:
        from librempeg_tpu.core.errors import InvalidData

        raise InvalidData("bad PNG filter type")
    return out


def png_filter(img: np.ndarray, h: int, stride: int, bpp: int) -> bytes:
    lib = get()
    assert lib is not None
    img = np.ascontiguousarray(img.reshape(-1), dtype=np.uint8)
    out = np.zeros(h * (stride + 1), np.uint8)
    lib.png_filter(_u8(img), h, stride, bpp, _u8(out))
    return out.tobytes()


def biquad(b, a, x: np.ndarray) -> np.ndarray:
    """Direct-form-II-transposed biquad over float32 samples."""
    lib = get()
    if lib is None:
        # pure-python fallback
        z1 = z2 = 0.0
        y = np.zeros_like(x)
        for i in range(len(x)):
            out = b[0] * x[i] + z1
            z1 = b[1] * x[i] - a[0] * out + z2
            z2 = b[2] * x[i] - a[1] * out
            y[i] = out
        return y
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    bb = np.asarray(b, np.float64)
    aa = np.asarray(a, np.float64)
    lib.biquad(bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
               aa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
               x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
               y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
               len(x))
    return y
