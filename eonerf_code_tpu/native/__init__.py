"""ctypes bindings for the native C++ host kernels (csrc/geo_native.cpp).

Compiled on first use with g++ (cached next to the source); every entry
point has a pure-Python fallback, so the framework works without a
toolchain. `available()` reports whether the native path is active.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "geo_native.cpp")


class _RpcCoeffs(ctypes.Structure):
    _fields_ = [
        ("row_offset", ctypes.c_double), ("col_offset", ctypes.c_double),
        ("lat_offset", ctypes.c_double), ("lon_offset", ctypes.c_double),
        ("alt_offset", ctypes.c_double),
        ("row_scale", ctypes.c_double), ("col_scale", ctypes.c_double),
        ("lat_scale", ctypes.c_double), ("lon_scale", ctypes.c_double),
        ("alt_scale", ctypes.c_double),
        ("row_num", ctypes.c_double * 20), ("row_den", ctypes.c_double * 20),
        ("col_num", ctypes.c_double * 20), ("col_den", ctypes.c_double * 20),
    ]


def _build():
    so_path = os.path.join(os.path.dirname(_SRC), "libeonerf_native.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", so_path]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rpc_localize_batch.argtypes = [ctypes.POINTER(_RpcCoeffs), dp, dp, dp,
                                       ctypes.c_int64, ctypes.c_int, dp, dp]
    lib.rpc_project_batch.argtypes = [ctypes.POINTER(_RpcCoeffs), dp, dp, dp,
                                      ctypes.c_int64, dp, dp]
    lib.ncc_search.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.downsample2x.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, dp]
    return lib


def _get():
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            try:
                _lib = _build()
            except Exception:
                _lib = None
    return _lib


def available():
    return _get() is not None


def _coeffs_struct(rpc):
    c = _RpcCoeffs()
    for k in ("row_offset", "col_offset", "lat_offset", "lon_offset", "alt_offset",
              "row_scale", "col_scale", "lat_scale", "lon_scale", "alt_scale"):
        setattr(c, k, float(getattr(rpc, k)))
    for k in ("row_num", "row_den", "col_num", "col_den"):
        getattr(c, k)[:] = [float(v) for v in getattr(rpc, k)]
    return c


def _as_f64(x):
    return np.ascontiguousarray(np.asarray(x, np.float64))


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rpc_localize(rpc, cols, rows, alts, iters=15):
    """Native batch Newton localization; returns (lons, lats) or None when
    the native library is unavailable."""
    lib = _get()
    if lib is None:
        return None
    cols, rows, alts = _as_f64(cols), _as_f64(rows), _as_f64(alts)
    n = cols.size
    lons = np.empty(n, np.float64)
    lats = np.empty(n, np.float64)
    c = _coeffs_struct(rpc)
    lib.rpc_localize_batch(ctypes.byref(c), _ptr(cols), _ptr(rows), _ptr(alts),
                           n, iters, _ptr(lons), _ptr(lats))
    return lons, lats


def rpc_project(rpc, lons, lats, alts):
    lib = _get()
    if lib is None:
        return None
    lons, lats, alts = _as_f64(lons), _as_f64(lats), _as_f64(alts)
    n = lons.size
    cols = np.empty(n, np.float64)
    rows = np.empty(n, np.float64)
    c = _coeffs_struct(rpc)
    lib.rpc_project_batch(ctypes.byref(c), _ptr(lons), _ptr(lats), _ptr(alts),
                          n, _ptr(cols), _ptr(rows))
    return cols, rows


def ncc_search(u, v, irange=5, initdx=0, initdy=0):
    """Native exhaustive NCC shift search on (h, w) float64 arrays."""
    lib = _get()
    if lib is None:
        return None
    u, v = _as_f64(u), _as_f64(v)
    assert u.ndim == 2 and v.shape == u.shape
    dx = ctypes.c_int(0)
    dy = ctypes.c_int(0)
    lib.ncc_search(_ptr(u), _ptr(v), u.shape[0], u.shape[1],
                   int(irange), int(initdx), int(initdy),
                   ctypes.byref(dx), ctypes.byref(dy))
    return dx.value, dy.value


def downsample2x(u):
    lib = _get()
    if lib is None:
        return None
    u = _as_f64(u)
    oh, ow = (u.shape[0] + 1) // 2, (u.shape[1] + 1) // 2
    out = np.empty((oh, ow), np.float64)
    lib.downsample2x(_ptr(u), u.shape[0], u.shape[1], _ptr(out))
    return out
