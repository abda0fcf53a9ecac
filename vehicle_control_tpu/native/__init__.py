"""ctypes bindings for the native (C++) trajectory-QP layer.

The shared library (native/libvcnative.so) provides the host-side
MA27-analogue solvers (see native/src/riccati.cc); it is built on first use
with the repo's Makefile (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvcnative.so")
_lib = None


def _stale():
    """True when any source/Makefile is newer than the built library."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    deps = [os.path.join(_NATIVE_DIR, "Makefile")]
    src_dir = os.path.join(_NATIVE_DIR, "src")
    if os.path.isdir(src_dir):
        deps += [os.path.join(src_dir, f) for f in os.listdir(src_dir)]
    return any(
        os.path.exists(d) and os.path.getmtime(d) > lib_mtime for d in deps
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.riccati_backward.restype = ctypes.c_int
    lib.riccati_backward.argtypes = [ctypes.c_int] * 3 + [dptr] * 7 + [
        ctypes.c_double
    ] + [dptr] * 3
    lib.kkt_newton_step.restype = ctypes.c_int
    lib.kkt_newton_step.argtypes = [ctypes.c_int] * 3 + [dptr] * 7 + [
        ctypes.c_double,
        dptr,
    ]
    _lib = lib
    return lib


def _as_c(a):
    a = np.ascontiguousarray(a, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def riccati_backward(lz, lu, lzz, luz, luu, A, B, rho):
    """Native Riccati sweep; mirrors solvers.riccati.riccati_backward.

    Returns (kff (H,nu), Kfb (H,nu,nx), dV1, dV2, fail)."""
    lib = _load()
    H, nx = np.asarray(lz).shape
    nu = np.asarray(lu).shape[-1]
    arrs = [_as_c(a) for a in (lz, lu, lzz, luz, luu, A, B)]
    kff = np.zeros((H, nu))
    Kfb = np.zeros((H, nu, nx))
    dV = np.zeros(2)
    _, pk = _as_c(kff)
    rc = lib.riccati_backward(
        H,
        nx,
        nu,
        *[p for _, p in arrs],
        ctypes.c_double(float(rho)),
        kff.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        Kfb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dV.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return kff, Kfb, float(dV[0]), float(dV[1]), bool(rc)


def kkt_newton_step(lz, lu, lzz, luz, luu, A, B, delta=1e-10):
    """Full-KKT Newton step via regularized LDL^T (the literal MA27 role).

    Returns du (H, nu), the open-loop Newton step with dx_0 = 0."""
    lib = _load()
    H, nx = np.asarray(lz).shape
    nu = np.asarray(lu).shape[-1]
    arrs = [_as_c(a) for a in (lz, lu, lzz, luz, luu, A, B)]
    du = np.zeros((H, nu))
    rc = lib.kkt_newton_step(
        H,
        nx,
        nu,
        *[p for _, p in arrs],
        ctypes.c_double(float(delta)),
        du.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError("kkt_newton_step: factorization failed")
    return du
