"""ctypes bindings for the native IO library (native/dmpio.cpp).

Self-bootstrapping: builds ``libdmpio.so`` with make/g++ on first use and
falls back to the pure-Python parsers when no toolchain is available. The
native and Python paths are tested byte-identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdmpio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dmpio_encode_aln.restype = ctypes.c_int
        lib.dmpio_encode_aln.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dmpio_parse_tdb.restype = ctypes.c_int32
        lib.dmpio_parse_tdb.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def encode_aln_bytes(text: bytes, max_seqs: int = 0):
    """Native aln encoding: bytes -> (nseqs, nres) uint8 array, or None."""
    lib = _load()
    if lib is None:
        return None
    # capacity: number of newline-bounded characters is a safe upper bound
    cap = len(text) + 1
    out = np.empty((cap,), np.uint8)
    nseqs = ctypes.c_int32()
    nres = ctypes.c_int32()
    rc = lib.dmpio_encode_aln(
        text, len(text), max_seqs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(nseqs), ctypes.byref(nres),
    )
    if rc != 0:
        raise ValueError(f"dmpio_encode_aln failed with code {rc}")
    mat = out[: nseqs.value * nres.value].reshape(nseqs.value, nres.value).copy()
    if mat.size and mat.max() >= 22:
        # same out-of-alphabet rejection as the Python encoder (utils/aln.py
        # encode_rows) — the two paths must accept identical inputs
        raise ValueError(
            "alignment contains characters outside the amino-acid alphabet "
            "— lowercase rows suggest an a3m file; rename to .a3m")
    return mat


def parse_tdb_bytes(text: bytes, max_residues: int = 100000):
    """Native tdb parse: bytes -> (classes (L,), coords (L,5,3)), or None."""
    lib = _load()
    if lib is None:
        return None
    classes = np.empty((max_residues,), np.int32)
    coords = np.empty((max_residues, 5, 3), np.float32)
    n = lib.dmpio_parse_tdb(
        text, len(text),
        classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_residues,
    )
    if n < 0:
        raise ValueError(f"dmpio_parse_tdb failed with code {n}")
    return classes[:n].copy(), coords[:n].copy()
