"""Native (C++) host kernels, built on demand with g++ and bound via ctypes.

The image has no pybind11, so bindings go through the C ABI. Falls back to
the numpy implementations transparently when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    cache = os.environ.get("NPORE_NATIVE_CACHE",
                           os.path.expanduser("~/.cache/npore_native"))
    os.makedirs(cache, exist_ok=True)
    src = os.path.join(_HERE, "npinfo.cpp")
    out = os.path.join(cache, "libnpore_native.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        path = _build()
        if path:
            try:
                lib = ctypes.CDLL(path)
                lib.np_info.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.c_int32, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32)]
                lib.np_info.restype = None
                lib.normalize_cigar.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.POINTER(ctypes.c_int8)]
                lib.normalize_cigar.restype = ctypes.c_int32
                _lib = lib
            except Exception:
                _lib = None
    return _lib


def np_info(seq: np.ndarray, max_n: int = 6, max_l: int = 100) -> np.ndarray:
    """Native get_np_info; exact reference semantics (src/aln.pyx:179-251).
    Falls back to the vectorized numpy version without a compiler."""
    lib = get_lib()
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    if lib is None:
        from ..ops.npinfo_host import get_np_info_vec
        return get_np_info_vec(seq, max_n, max_l)
    out = np.empty((len(seq), 2, max_n), dtype=np.int32)
    lib.np_info(seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(seq), max_n, max_l,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def normalize_cigar_ints(cig: np.ndarray, int_ref: np.ndarray,
                         int_seq: np.ndarray) -> Optional[np.ndarray]:
    """Native in-place left-normalization fixpoint over int-coded ops
    (reference: src/bam.pyx:70-77). Returns None without a compiler."""
    lib = get_lib()
    if lib is None:
        return None
    cig = np.ascontiguousarray(cig, dtype=np.uint8)
    ref8 = np.ascontiguousarray(int_ref, dtype=np.int8)
    seq8 = np.ascontiguousarray(int_seq, dtype=np.int8)
    lib.normalize_cigar(
        cig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(cig),
        ref8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        seq8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return cig
