"""ctypes bindings for the native tabular loader (`native/tabloader.cpp`).

The C++ library handles the host half of the input pipeline — multithreaded
mmap'd CSV parsing, per-column standardization, deterministic epoch
shuffling — for UCI-scale tabular density estimation (POWER 6D ~2M rows,
MINIBOONE 43D).  A NumPy fallback keeps everything working where the shared
library can't be built.

The library is compiled on demand with `make -C native` (g++, no external
deps) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtabloader.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.tab_open_csv.restype = ctypes.c_void_p
        lib.tab_open_csv.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tab_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.tab_data.argtypes = [ctypes.c_void_p]
        lib.tab_standardize.restype = None
        lib.tab_standardize.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.tab_close.restype = None
        lib.tab_close.argtypes = [ctypes.c_void_p]
        lib.tab_shuffle_indices.restype = None
        lib.tab_shuffle_indices.argtypes = [
            ctypes.c_uint64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_csv(
    path: str,
    has_header: bool = False,
    delimiter: str = ",",
    standardize: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Parse a numeric CSV into a float32 (rows, cols) array.

    Returns (data, mean, std); mean/std are None unless `standardize`.
    Uses the native parser when available, NumPy otherwise.
    """
    lib = _load_lib()
    if lib is None:
        data = np.loadtxt(
            path, delimiter=delimiter, skiprows=1 if has_header else 0, dtype=np.float32
        )
        if data.ndim == 1:
            data = data[:, None]
        mean = std = None
        if standardize:
            mean = data.mean(axis=0)
            std = data.std(axis=0)
            std = np.where(std < 1e-12, 1.0, std)
            data = (data - mean) / std
        return data, mean, std

    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    handle = lib.tab_open_csv(
        path.encode(), int(has_header), delimiter.encode(), ctypes.byref(rows), ctypes.byref(cols)
    )
    if not handle:
        raise IOError(f"tabloader: failed to parse {path}")
    try:
        R, C = rows.value, cols.value
        mean = std = None
        if standardize:
            mean = np.empty((C,), np.float32)
            std = np.empty((C,), np.float32)
            lib.tab_standardize(
                handle,
                mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        buf = lib.tab_data(handle)
        data = np.ctypeslib.as_array(buf, shape=(R, C)).copy()
        return data, mean, std
    finally:
        lib.tab_close(handle)


def shuffled_indices(seed: int, n: int) -> np.ndarray:
    """Deterministic epoch permutation of [0, n) (native Fisher–Yates, or
    NumPy fallback with the same determinism guarantee per backend)."""
    lib = _load_lib()
    if lib is None:
        return np.random.default_rng(seed).permutation(n).astype(np.int64)
    out = np.empty((n,), np.int64)
    lib.tab_shuffle_indices(
        ctypes.c_uint64(seed), n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    )
    return out


__all__ = ["load_csv", "shuffled_indices", "native_available"]
