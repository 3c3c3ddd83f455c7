"""Numeric-table parsing for grid bakes.

The reference's bake-time data loader is ``pandas.read_csv`` over multi-GB
MIST ASCII tables (mist/models.py:135-148, 264-289; bc.py:74-84). Here the
hot path is a native C++ single-pass mmap+strtod parser
(``native/fastparse.cpp``), compiled on demand with g++ and loaded via
ctypes (no pybind11 in this environment), with a pandas fallback when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..logger import getLogger

__all__ = ["read_whitespace_table", "parse_numeric_table", "get_fastparse_lib"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastparse.cpp")
_LIB = os.path.join(_NATIVE_DIR, "_fastparse.so")

_lib = None
_lib_failed = False


def _build_lib():
    # no -march=native: the parser is strtod-bound (ISA gains are nil) and a
    # portable binary can't SIGILL if it ever escapes this machine
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    getLogger().info("Building native parser: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def get_fastparse_lib():
    """Load (compiling if needed) the native parser; None when unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build_lib()
        lib = ctypes.CDLL(_LIB)
        lib.count_table.restype = ctypes.c_int
        lib.count_table.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.parse_table.restype = ctypes.c_int64
        lib.parse_table.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
    except Exception as e:  # no g++ / load failure -> pandas fallback
        getLogger().warning("native parser unavailable (%s); using pandas fallback", e)
        _lib_failed = True
    return _lib


def parse_numeric_table(filename) -> np.ndarray:
    """Parse a '#'-commented whitespace numeric table to a (rows, cols)
    float64 array using the native parser (pandas fallback)."""
    lib = get_fastparse_lib()
    if lib is None:
        return _pandas_parse(filename)

    import mmap

    with open(filename, "rb") as f:
        n = os.fstat(f.fileno()).st_size
        if n == 0:
            return np.empty((0, 0), dtype=np.float64)
        # ACCESS_COPY: pages stay shared (kernel copy-on-write) but the
        # buffer is writable from Python's side, which ctypes.from_buffer
        # requires; nothing here writes, so no page is ever copied
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_COPY) as mm:
            buf = ctypes.c_char_p(ctypes.addressof(ctypes.c_char.from_buffer(mm)))
            n_rows = ctypes.c_int64()
            n_cols = ctypes.c_int64()
            rc = lib.count_table(buf, n, ctypes.byref(n_rows), ctypes.byref(n_cols))
            if rc != 0:
                # ragged table: rows disagree on column count — the fast
                # path would silently truncate/pad; use the strict parser
                getLogger().warning(
                    "%s has inconsistent column counts; falling back to the "
                    "strict pandas parser", filename,
                )
                return _pandas_parse(filename)
            out = np.empty((n_rows.value, n_cols.value), dtype=np.float64)
            parsed = lib.parse_table(buf, n, out, n_rows.value, n_cols.value)
    if parsed != n_rows.value:
        raise IOError(f"parsed {parsed} rows, expected {n_rows.value} in {filename}")
    return out


def _pandas_parse(filename):
    import pandas as pd

    return pd.read_csv(filename, sep=r"\s+", comment="#", header=None).values.astype(float)


def read_whitespace_table(filename, names):
    """DataFrame view of :func:`parse_numeric_table` with given column names."""
    import pandas as pd

    data = parse_numeric_table(filename)
    if data.shape[1] != len(names):
        raise ValueError(f"{filename}: {data.shape[1]} columns, expected {len(names)} ({names})")
    return pd.DataFrame(data, columns=list(names))
