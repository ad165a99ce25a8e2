"""ctypes bindings for the native host-side diagnostics kernels.

Compiles ``hostutils.cpp`` on first use (g++ -O3 -shared -fopenmp) into a
cached shared library next to the source; falls back gracefully (returns
None from :func:`load`) when no toolchain is available, in which case
diagnostics.py uses its numpy reference implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "hostutils.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_hostutils.so")


def _build() -> bool:
    cmds = [
        ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-o", _SO, _SRC],
        ["g++", "-O3", "-fPIC", "-shared", "-o", _SO, _SRC],  # no OpenMP
    ]
    for cmd in cmds:
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def load():
    """Returns the loaded CDLL or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ess_bulk.restype = ctypes.c_int
        lib.ess_bulk.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pooled_moments.restype = ctypes.c_int
        lib.pooled_moments.argtypes = [ctypes.POINTER(ctypes.c_double)] * 3 + [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
        return _LIB


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ess_bulk(samples: np.ndarray):
    """Native per-parameter bulk ESS for (C, K, D) float64 samples.
    Returns None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float64)
    if samples.ndim == 2:
        samples = samples[:, :, None]
    C, K, D = samples.shape
    out = np.empty(D, np.float64)
    rc = lib.ess_bulk(_ptr(samples), C, K, D, _ptr(out))
    if rc != 0:
        return None
    return out


def pooled_moments(counts, means, m2s):
    """Merge per-shard Welford moments; returns (mean, var) per parameter
    or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, np.float64)
    means = np.ascontiguousarray(means, np.float64)
    m2s = np.ascontiguousarray(m2s, np.float64)
    S, D = means.shape
    out_mean = np.empty(D, np.float64)
    out_var = np.empty(D, np.float64)
    rc = lib.pooled_moments(_ptr(counts), _ptr(means), _ptr(m2s), S, D,
                            _ptr(out_mean), _ptr(out_var))
    if rc != 0:
        return None
    return out_mean, out_var
