"""Native (C++) host-runtime kernels, loaded via ctypes.

Compiled on first use with g++ into the package directory; every native
entry point has a pure-Python fallback, so absence of a toolchain degrades
gracefully (`available()` gates all call sites).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_SRC = Path(__file__).parent / "fasthash.cpp"
_SO = Path(__file__).parent / "libfasthash.so"


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(_SO),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _LIB_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.embed_batch.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.float32, flags="C"),
            ]
            lib.embed_batch.restype = None
            lib.bucket_df.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
            ]
            lib.bucket_df.restype = None
            _LIB = lib
        except OSError:
            _LIB_FAILED = True
        return _LIB


def available() -> bool:
    return _load() is not None


def _pack(texts: Sequence[str]):
    encoded = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(encoded) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return b"".join(encoded), offsets


def embed_batch(
    texts: Sequence[str],
    dim: int,
    *,
    use_bigrams: bool = True,
    idf: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Native hashing embed; None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    blob, offsets = _pack(texts)
    out = np.zeros((len(texts), dim), dtype=np.float32)
    idf_ptr = None
    if idf is not None:
        idf = np.ascontiguousarray(idf, dtype=np.float64)
        idf_ptr = idf.ctypes.data_as(ctypes.c_void_p)
    lib.embed_batch(
        blob, offsets, len(texts), dim, int(use_bigrams), idf_ptr, out
    )
    return out


def bucket_df(
    texts: Sequence[str], dim: int, *, use_bigrams: bool = True
) -> Optional[np.ndarray]:
    """Native per-bucket document-frequency pass; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    blob, offsets = _pack(texts)
    df = np.zeros(dim, dtype=np.int64)
    lib.bucket_df(blob, offsets, len(texts), dim, int(use_bigrams), df)
    return df
