"""Native (C++) host-side runtime components, loaded via ctypes.

Reference mapping (SURVEY.md §2.6): GPy ships Cython/C inner loops
(state_space_cython.pyx, stationary_utils.c, ...). On TPU the compute
path is XLA/Pallas (gpy_tpu/ops); these C++ components cover the places
where the *host/CPU* path matters — currently the sequential Kalman
filter/smoother, where per-step dispatch of tiny (s x s) ops makes an
XLA CPU scan slow.

The shared library is compiled lazily with g++ on first use and cached
next to the source; set GPY_TPU_NO_NATIVE=1 to disable (pure-JAX paths
are always available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "kalman_filter_cpp", "rts_smoother_cpp"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kalman.cpp")
_LIB = os.path.join(_HERE, "libgpytpu_native.so")
_lib_handle = [None]
_load_error = [None]


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    if _lib_handle[0] is not None:
        return _lib_handle[0]
    if _load_error[0] is not None:
        raise _load_error[0]
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        dp = ctypes.POINTER(ctypes.c_double)
        ub = ctypes.POINTER(ctypes.c_ubyte)
        lib.kalman_filter.restype = ctypes.c_int
        lib.kalman_filter.argtypes = [dp, dp, dp, dp, ub, dp, ctypes.c_double,
                                      ctypes.c_long, ctypes.c_int,
                                      dp, dp, dp, dp, dp]
        lib.rts_smoother.restype = ctypes.c_int
        lib.rts_smoother.argtypes = [dp, dp, dp, dp, dp, ctypes.c_long,
                                     ctypes.c_int, dp, dp]
        _lib_handle[0] = lib
        return lib
    except Exception as e:  # g++ missing, compile error, ...
        _load_error[0] = RuntimeError(f"native library unavailable: {e}")
        raise _load_error[0]


def available():
    if os.environ.get("GPY_TPU_NO_NATIVE", "0") == "1":
        return False
    try:
        _load()
        return True
    except Exception:
        return False


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kalman_filter_cpp(A, Q, H, ys, mask, P0, sigma2):
    """Sequential Kalman filter in C++ (f64). Shapes: A,Q (N-1,s,s),
    H (1,s) or (s,), ys (N,), mask (N,) bool, P0 (s,s).

    Returns (loglik, ms (N,s,1), Ps (N,s,s), mpreds (N,s,1), Ppreds (N,s,s)).
    """
    lib = _load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    Q = np.ascontiguousarray(Q, dtype=np.float64)
    H = np.ascontiguousarray(np.asarray(H).reshape(-1), dtype=np.float64)
    ys = np.ascontiguousarray(np.asarray(ys).reshape(-1), dtype=np.float64)
    mask = np.ascontiguousarray(np.asarray(mask).reshape(-1), dtype=np.uint8)
    P0 = np.ascontiguousarray(P0, dtype=np.float64)
    N, s = ys.shape[0], P0.shape[0]
    ms = np.zeros((N, s)); Ps = np.zeros((N, s, s))
    mpreds = np.zeros((N, s)); Ppreds = np.zeros((N, s, s))
    ll = np.zeros(1)
    rc = lib.kalman_filter(_dptr(A), _dptr(Q), _dptr(H), _dptr(ys),
                           mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                           _dptr(P0), float(sigma2), N, s,
                           _dptr(ms), _dptr(Ps), _dptr(mpreds), _dptr(Ppreds),
                           _dptr(ll))
    if rc != 0:
        raise RuntimeError(f"kalman_filter failed (rc={rc})")
    return float(ll[0]), ms[:, :, None], Ps, mpreds[:, :, None], Ppreds


def rts_smoother_cpp(ms, Ps, mpreds, Ppreds, A):
    """RTS smoother in C++ over filter outputs; returns (ms_s (N,s,1),
    Ps_s (N,s,s))."""
    lib = _load()
    ms = np.ascontiguousarray(np.asarray(ms).reshape(np.asarray(ms).shape[0], -1), dtype=np.float64)
    Ps = np.ascontiguousarray(Ps, dtype=np.float64)
    mpreds = np.ascontiguousarray(np.asarray(mpreds).reshape(ms.shape), dtype=np.float64)
    Ppreds = np.ascontiguousarray(Ppreds, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    N, s = ms.shape
    ms_s = np.zeros((N, s)); Ps_s = np.zeros((N, s, s))
    rc = lib.rts_smoother(_dptr(ms), _dptr(Ps), _dptr(mpreds), _dptr(Ppreds),
                          _dptr(A), N, s, _dptr(ms_s), _dptr(Ps_s))
    if rc != 0:
        raise RuntimeError(f"rts_smoother failed (rc={rc})")
    return ms_s[:, :, None], Ps_s
