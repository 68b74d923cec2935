"""Native (C++) host-runtime kernels, loaded via ctypes.

Compiled on first use with g++ into the package directory; every native
entry point has a pure-Python fallback, so absence of a toolchain degrades
gracefully (`available()` gates all call sites).
"""

from __future__ import annotations

import ctypes
import hashlib
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


def _src_hash(src: Path) -> str:
    return hashlib.sha256(src.read_bytes()).hexdigest()


def _so_current(src: Path, so: Path) -> bool:
    """True iff `so` exists and its sidecar records the hash of `src`.

    mtime comparison is unreliable after a fresh clone (both files get
    checkout-time stamps in arbitrary order), so currency is keyed on the
    SOURCE CONTENT: builds write `<so>.srchash`; a binary without a matching
    sidecar — stale, foreign, or checked out — is rebuilt."""
    sidecar = so.with_suffix(so.suffix + ".srchash")
    try:
        return (
            so.exists()
            and sidecar.read_text().strip() == _src_hash(src)
        )
    except OSError:
        return False


def _build_so(src: Path, so: Path) -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(src), "-o", str(so),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        so.with_suffix(so.suffix + ".srchash").write_text(_src_hash(src))
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if not _so_current(_SRC, _SO):
            if not _build_so(_SRC, _SO):
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


# ---------------------------------------------------------------------------
# Native WordPiece tokenizer (wordpiece.cpp — its own .so, same pattern)
# ---------------------------------------------------------------------------

_WP_SRC = Path(__file__).parent / "wordpiece.cpp"
_WP_SO = Path(__file__).parent / "libwordpiece.so"
_WP_LIB: Optional[ctypes.CDLL] = None
_WP_FAILED = False


def _wp_load() -> Optional[ctypes.CDLL]:
    global _WP_LIB, _WP_FAILED
    with _LIB_LOCK:
        if _WP_LIB is not None or _WP_FAILED:
            return _WP_LIB
        if not _so_current(_WP_SRC, _WP_SO):
            if not _build_so(_WP_SRC, _WP_SO):
                _WP_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(str(_WP_SO))
            lib.wp_create.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                ctypes.c_int64,
            ]
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            lib.wp_destroy.restype = None
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C"),
                np.ctypeslib.ndpointer(np.int32, flags="C"),
            ]
            lib.wp_encode_batch.restype = None
            _WP_LIB = lib
        except OSError:
            _WP_FAILED = True
        return _WP_LIB


class NativeWordPiece:
    """Handle over the C++ WordPiece tokenizer.  `create` returns None when
    the native library is unavailable — callers keep the Python path."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle

    @classmethod
    def create(cls, vocab_words: Sequence[str]) -> Optional["NativeWordPiece"]:
        lib = _wp_load()
        if lib is None:
            return None
        blob, offsets = _pack(vocab_words)
        handle = lib.wp_create(blob, offsets, len(vocab_words))
        return cls(lib, handle)

    def encode_batch(
        self, texts: Sequence[str], max_len: int, *, lowercase: bool,
        cls_id: int, sep_id: int, unk_id: int,
    ):
        blob, offsets = _pack(texts)
        ids = np.zeros((len(texts), max_len), dtype=np.int32)
        mask = np.zeros((len(texts), max_len), dtype=np.int32)
        self._lib.wp_encode_batch(
            self._handle, blob, offsets, len(texts),
            np.int32(max_len), np.int32(lowercase),
            np.int32(cls_id), np.int32(sep_id), np.int32(unk_id),
            ids, mask,
        )
        return ids, mask

    def __del__(self):
        try:
            if self._handle:
                self._lib.wp_destroy(self._handle)
        except Exception:
            pass
