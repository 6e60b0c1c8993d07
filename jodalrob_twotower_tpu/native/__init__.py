"""ctypes loader for the native host-data-plane library (_native.so).

Compiles gather.cpp with g++ on first import (cached next to the source;
rebuilt when the source is newer). Falls back to None when no toolchain is
available — callers must handle `lib() is None` with a numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "gather.cpp"
_SO = _DIR / "_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None | bool = False  # False = not attempted


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None when unavailable."""
    global _lib
    if _lib is not False:
        return _lib
    with _lock:
        if _lib is not False:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                if not _build():
                    _lib = None
                    return None
            cdll = ctypes.CDLL(str(_SO))
            cdll.gather_rows.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            cdll.gather_pair_batch.argtypes = [ctypes.c_char_p] * 4 + [
                ctypes.POINTER(ctypes.c_int64)] * 2 + [ctypes.c_char_p] * 4 + [
                ctypes.c_int64] * 6
            cdll.crc32c.restype = ctypes.c_uint32
            cdll.crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
            _lib = cdll
        except Exception:
            _lib = None
    return _lib


_DEFAULT_THREADS = min(os.cpu_count() or 1, 16)


def _check_bounds(rows: np.ndarray, n_src_rows: int) -> np.ndarray:
    """Indices must be in [0, n): the C++ kernel does raw memcpy arithmetic
    (no negative wrapping), so enforce ONE contract on both the native and
    numpy paths rather than silently reading arbitrary memory."""
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    if rows.size and (rows.min() < 0 or rows.max() >= n_src_rows):
        raise IndexError(
            f"row indices out of bounds for source with {n_src_rows} rows "
            f"(min {rows.min()}, max {rows.max()}; negatives not allowed)"
        )
    return rows


def _as_i64_ptr(rows: np.ndarray):
    return rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_rows(src: np.ndarray, rows: np.ndarray, *, n_threads: int | None = None) -> np.ndarray:
    """Multithreaded dst = src[rows]; numpy fallback when native is absent."""
    rows = _check_bounds(rows, src.shape[0])
    l = lib()
    if l is None:
        return src[rows]
    src = np.ascontiguousarray(src)
    rows_ptr = _as_i64_ptr(rows)
    out = np.empty((rows.shape[0],) + src.shape[1:], dtype=src.dtype)
    row_bytes = src.strides[0]
    l.gather_rows(
        src.ctypes.data_as(ctypes.c_char_p), rows_ptr,
        out.ctypes.data_as(ctypes.c_char_p),
        rows.shape[0], row_bytes, n_threads or _DEFAULT_THREADS,
    )
    return out


def gather_pair_batch(
    n_dense: np.ndarray, n_cat: np.ndarray,
    c_dense: np.ndarray, c_cat: np.ndarray,
    notice_rows: np.ndarray, company_rows: np.ndarray,
    *, n_threads: int | None = None,
):
    """Assemble all four batch matrices in one native thread-pool pass."""
    nr = _check_bounds(notice_rows, n_dense.shape[0])
    cr = _check_bounds(company_rows, c_dense.shape[0])
    l = lib()
    if l is None:
        return (
            n_dense[nr], n_cat[nr],
            c_dense[cr], c_cat[cr],
        )
    b = nr.shape[0]
    nr_p, cr_p = _as_i64_ptr(nr), _as_i64_ptr(cr)
    # materialize contiguous sources FIRST and take strides from the copies
    # — passing the original (possibly sliced/non-contiguous) arrays'
    # strides with the copies' data pointers would walk the wrong pitch
    srcs = [np.ascontiguousarray(m) for m in (n_dense, n_cat, c_dense, c_cat)]
    outs = [np.empty((b,) + m.shape[1:], dtype=m.dtype) for m in srcs]
    l.gather_pair_batch(
        *(m.ctypes.data_as(ctypes.c_char_p) for m in srcs),
        nr_p, cr_p,
        *(o.ctypes.data_as(ctypes.c_char_p) for o in outs),
        b,
        *(m.strides[0] for m in srcs),
        n_threads or _DEFAULT_THREADS,
    )
    return tuple(outs)


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC32C (Castagnoli); pure-python fallback."""
    l = lib()
    if l is not None:
        return int(l.crc32c(data, len(data), crc))
    return _crc32c_py(data, crc)


_PY_TABLE: list[int] | None = None


def _crc32c_py(data: bytes, crc: int = 0) -> int:
    global _PY_TABLE
    if _PY_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (poly if c & 1 else 0)
            tbl.append(c)
        _PY_TABLE = tbl
    crc = ~crc & 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ _PY_TABLE[(crc ^ byte) & 0xFF]
    return ~crc & 0xFFFFFFFF
