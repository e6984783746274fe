"""Native host-side preprocessing library (C++ via ctypes).

Build once per machine with `python -m hgnn2_tpu.native.build` (or just
call ensure_built()); every entry point has a numpy fallback so the
framework runs without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_THIS_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_THIS_DIR, "src", "hgnn2_native.cpp")
_LIB = os.path.join(_THIS_DIR, "_hgnn2_native.so")

_lib = None
_load_failed = False


def build(force: bool = False) -> str:
    """Compile the shared library with g++."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True)
    return _LIB


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(_LIB)
        lib.build_line_graph.restype = ctypes.c_int64
        lib.build_line_graph.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.build_chi_tables.restype = ctypes.c_int32
        lib.build_chi_tables.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.parse_xyz_atoms.restype = ctypes.c_int64
        lib.parse_xyz_atoms.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_char),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"hgnn2_tpu.native: build/load failed ({e}); using numpy fallback",
              file=sys.stderr)
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_line_graph_native(A: np.ndarray):
    """Returns (src, dst, w, rev) int32/float32 arrays, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, dtype=np.float32)
    n = A.shape[0]
    cap = int((A != 0).sum()) + 2
    src = np.empty(cap, np.int32)
    dst = np.empty(cap, np.int32)
    w = np.empty(cap, np.float32)
    rev = np.empty(cap, np.int32)
    m = lib.build_line_graph(_fptr(A), n, cap, _iptr(src), _iptr(dst),
                             _fptr(w), _iptr(rev))
    if m < 0:
        raise RuntimeError("edge capacity exceeded")
    return src[:m].copy(), dst[:m].copy(), w[:m].copy(), rev[:m].copy()


def build_chi_tables_native(offsets, lists, K, v0, chi_idx, rslot, nbr, deg,
                            rmask):
    """Fill chi_idx/rslot/nbr/deg/rmask for one graph (see C++ docstring;
    chi_idx and rslot must be pre-filled with -1). Returns False when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    offsets = np.ascontiguousarray(offsets, dtype=np.int32)
    lists = np.ascontiguousarray(lists, dtype=np.int32)
    rc = lib.build_chi_tables(
        _iptr(offsets), _iptr(lists), len(offsets) - 1, K, v0,
        _iptr(chi_idx), _iptr(rslot), _iptr(nbr), _fptr(deg), _fptr(rmask),
    )
    if rc != 0:
        raise ValueError(f"degree exceeds K={K}")
    return True


def parse_xyz_atoms_native(text: str, na: int):
    """Parse an atom block; returns (symbols, coords, charges) or None."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    symbols = np.zeros((na, 2), dtype=np.uint8)
    coords = np.empty((na, 3), np.float32)
    charges = np.empty(na, np.float32)
    got = lib.parse_xyz_atoms(
        raw, na, symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        _fptr(coords), _fptr(charges),
    )
    if got != na:
        raise ValueError("atom parse failed")
    syms = [bytes(symbols[i]).decode().strip() for i in range(na)]
    return syms, coords, charges
