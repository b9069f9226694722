"""Native (C++) runtime components, loaded via ctypes.

The reference stack's only native code is in its binary dependencies —
Ipopt's C++ interior point with MUMPS/HSL sparse LDL^T factorization and
OpenBLAS (SURVEY.md section 2.9). piccolax replaces the on-device compute
path with JAX/XLA, and this package provides the *host-side* native
counterpart: an exact double-precision block-tridiagonal quasidefinite
KKT factorization (`native/px_kkt.cpp`), OpenMP-parallel over the batch
axis. It serves as

- an alternative KKT backend for CPU solves (the role MadNLP plays as
  Ipopt's alternative in the reference, `visualizations/live_callbacks.jl:25`),
- the independent oracle the matmul-only TPU factorization
  (`solver/kkt.py`) is verified against in tests.

The shared library is compiled on first use with g++ and cached next to
the sources; everything degrades gracefully (`available() -> False`) if
no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "qd_solve", "spd_tridiag_solve", "build"]

_lock = threading.Lock()
_lib = None
_tried = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_SRC_DIR, "libpxkkt.so")
_CPP_PATH = os.path.join(_SRC_DIR, "px_kkt.cpp")


def build(force: bool = False) -> str | None:
    """Compile native/px_kkt.cpp -> libpxkkt.so. Returns path or None."""
    if not os.path.exists(_CPP_PATH):
        return None
    if (not force and os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_CPP_PATH)):
        return _SO_PATH
    cmd = ["g++", "-O3", "-fPIC", "-fopenmp", "-std=c++17", "-shared",
           "-o", _SO_PATH, _CPP_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:  # retry without OpenMP
            cmd = [c for c in cmd if c != "-fopenmp"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    return _SO_PATH if os.path.exists(_SO_PATH) else None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        c_i32 = ctypes.c_int32
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_ip = ctypes.POINTER(ctypes.c_int32)
        lib.px_qd_solve_batch.restype = c_i32
        lib.px_qd_solve_batch.argtypes = [c_i32] * 5 + [c_dp] * 6 + [c_ip]
        lib.px_spd_tridiag_solve_batch.restype = c_i32
        lib.px_spd_tridiag_solve_batch.argtypes = \
            [c_i32] * 4 + [c_dp] * 4 + [c_ip]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_c(x):
    a = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def qd_solve(P, C, Rdiag, Cnext, rhs):
    """Solve the quasidefinite block-tridiagonal KKT (batched).

    Shapes (leading batch axis optional):
      P [B, N, dz, dz], C [B, N, m, dz], Rdiag [B, N, m],
      Cnext [B, N-1, m, dz], rhs [B, N, dz+m, r].
    Returns (x like rhs, status [B] int32). Failed factorizations yield
    NaN solutions and status 1 — matching solver/kkt.py semantics.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native KKT library unavailable")
    P = np.asarray(P, np.float64)
    batched = P.ndim == 4
    if not batched:
        P, C, Rdiag, Cnext, rhs = (np.asarray(a)[None] for a in
                                   (P, C, Rdiag, Cnext, rhs))
    rhs = np.asarray(rhs)
    squeeze_r = rhs.ndim == 3          # [B, N, mb] -> one rhs column
    if squeeze_r:
        rhs = rhs[..., None]
    B, N, dz, _ = P.shape
    m = C.shape[2]
    r = rhs.shape[-1]
    P, pP = _as_c(P)
    C, pC = _as_c(C)
    Rdiag, pR = _as_c(Rdiag)
    Cnext, pCn = _as_c(Cnext)
    rhs, prhs = _as_c(rhs)
    out = np.empty((B, N, dz + m, r), np.float64)
    pout = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    status = np.empty(B, np.int32)
    pstat = status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.px_qd_solve_batch(B, N, dz, m, r, pP, pC, pR, pCn, prhs, pout, pstat)
    if squeeze_r:
        out = out[..., 0]
    if not batched:
        out, status = out[0], status[0]
    return out, status


def spd_tridiag_solve(diag, upper, rhs):
    """Solve an SPD block-tridiagonal system (batched).

    diag [B, N, m, m], upper [B, N-1, m, m], rhs [B, N, m(, r)].
    Returns (x, status [B]).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native KKT library unavailable")
    diag = np.asarray(diag, np.float64)
    batched = diag.ndim == 4
    if not batched:
        diag, upper, rhs = (np.asarray(a)[None] for a in (diag, upper, rhs))
    rhs = np.asarray(rhs)
    squeeze_r = rhs.ndim == 3
    if squeeze_r:
        rhs = rhs[..., None]
    B, N, m, _ = diag.shape
    r = rhs.shape[-1]
    diag, pD = _as_c(diag)
    upper, pU = _as_c(upper)
    rhs, prhs = _as_c(rhs)
    out = np.empty((B, N, m, r), np.float64)
    pout = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    status = np.empty(B, np.int32)
    pstat = status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.px_spd_tridiag_solve_batch(B, N, m, r, pD, pU, prhs, pout, pstat)
    if squeeze_r:
        out = out[..., 0]
    if not batched:
        out, status = out[0], status[0]
    return out, status
