"""Native (C++) host runtime components, loaded via ctypes.

Built lazily with g++ on first use; every consumer has a pure-numpy
fallback, so the framework works without a toolchain. Components:

- ``libepisodic`` — episodic index sampler + row gather
  (episodic_sampler.cpp): the host-path replacement for the reference's
  per-episode Python/torchmeta object traffic (ref: data.py:294-581).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "episodic_sampler.cpp")
    out = os.path.join(_DIR, "libepisodic.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", out],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None if unavailable (fallback to numpy)."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.sample_episodes.restype = ctypes.c_int
        lib.sample_episodes.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gather_rows_f32.restype = None
        lib.gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return _LIB


def sample_episodes_native(lib, seed: int, counter: int, counts,
                           B: int, N: int, KQ: int):
    """ctypes wrapper: returns (class_idx (B,N), sel (B,N,KQ)) int32."""
    import numpy as np
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    class_idx = np.empty((B, N), dtype=np.int32)
    sel = np.empty((B, N, KQ), dtype=np.int32)
    rc = lib.sample_episodes(
        ctypes.c_uint64(seed), ctypes.c_uint64(counter),
        ctypes.c_int32(len(counts)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(B), ctypes.c_int32(N), ctypes.c_int32(KQ),
        class_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc == -1:
        raise ValueError("N exceeds number of classes")
    if rc == -2:
        raise ValueError("a sampled class has fewer than K+Q images")
    return class_idx, sel


def gather_rows_native(lib, table, rows):
    """out[i] = table[rows[i]] via native memcpy loop (float32)."""
    import numpy as np
    table = np.ascontiguousarray(table, dtype=np.float32)
    rows = np.ascontiguousarray(rows, dtype=np.int32).reshape(-1)
    out = np.empty((rows.shape[0], table.shape[1]), dtype=np.float32)
    lib.gather_rows_f32(
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(table.shape[1]),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(rows.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
