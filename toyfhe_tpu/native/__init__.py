"""Native C++ host runtime binding (ctypes; builds on first use).

Accelerates the host/device seam decode paths (exact CRT reconstruction,
centered lifts, Δ-rounding, noise metering) — the role FLINT plays for
the reference. Falls back to the pure-Python exact paths in
utils/numtheory + core/ring when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fhe_host.cpp")
_SO = os.path.join(_HERE, "libfhe_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Returns the loaded library or None (Python fallback)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.fhe_crt_ctx_size.restype = ctypes.c_size_t
            lib.fhe_crt_init.restype = ctypes.c_int
            lib.fhe_noise_worst.restype = ctypes.c_double
            _lib = lib
        except Exception:
            _lib = None
        return _lib


class CrtNative:
    """Per-ring native CRT context (cached on the RingContext)."""

    def __init__(self, primes):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self.lib = lib
        self.L = len(primes)
        self.ctx = ctypes.create_string_buffer(lib.fhe_crt_ctx_size())
        ps = np.asarray(primes, dtype=np.uint64)
        rc = lib.fhe_crt_init(self.ctx, ps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                              self.L)
        if rc <= 0:
            raise RuntimeError(f"fhe_crt_init failed: {rc}")

    def _res64(self, residues: np.ndarray) -> np.ndarray:
        r = np.ascontiguousarray(residues, dtype=np.uint64)
        assert r.ndim == 2 and r.shape[0] == self.L
        return r

    def decode_centered_mod(self, residues: np.ndarray, p: int) -> np.ndarray:
        r = self._res64(residues)
        n = r.shape[1]
        out = np.zeros(n, dtype=np.int64)
        self.lib.fhe_decode_centered_mod(
            self.ctx, r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n, ctypes.c_uint64(p),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    @staticmethod
    def _words(x: int) -> np.ndarray:
        w = []
        while x:
            w.append(x & 0xFFFFFFFFFFFFFFFF)
            x >>= 64
        return np.asarray(w or [0], dtype=np.uint64)

    def decode_bfv(self, residues: np.ndarray, delta: int, p: int) -> np.ndarray:
        r = self._res64(residues)
        n = r.shape[1]
        dw = self._words(delta)
        out = np.zeros(n, dtype=np.int64)
        self.lib.fhe_decode_bfv(
            self.ctx, r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
            dw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(dw),
            ctypes.c_uint64(p),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def decode_centered_double(self, residues: np.ndarray) -> np.ndarray:
        r = self._res64(residues)
        n = r.shape[1]
        out = np.zeros(n, dtype=np.float64)
        self.lib.fhe_decode_centered_double(
            self.ctx, r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out

    def noise_worst(self, residues: np.ndarray, delta: int) -> float:
        r = self._res64(residues)
        n = r.shape[1]
        dw = self._words(delta)
        return float(self.lib.fhe_noise_worst(
            self.ctx, r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
            dw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(dw)))
