"""ctypes binding for the native IO library (native/tsv_reader.cpp).

The C++ fast path does seek + read + split + base64 -> float32 in one pass
per row - the data-loader hot op the reference runs in Python workers
(ref:alad/dataset.py:317-324). Falls back to the pure-Python TSVFile when
the .so has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libaladin_io.so")
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    srcs = [
        os.path.join(os.path.dirname(path), f)
        for f in ("tsv_reader.cpp", "wordpiece.cpp")
    ]
    stale = os.path.exists(path) and any(
        os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(path)
        for s in srcs
    )
    if (not os.path.exists(path) or stale) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)], check=True, capture_output=True
            )
        except Exception:
            if not os.path.exists(path):
                return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.aladin_b64_decode.restype = ctypes.c_int64
    lib.aladin_b64_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.aladin_build_lineidx.restype = ctypes.c_int64
    lib.aladin_build_lineidx.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.aladin_tsv_open.restype = ctypes.c_void_p
    lib.aladin_tsv_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.aladin_tsv_num_rows.restype = ctypes.c_int64
    lib.aladin_tsv_num_rows.argtypes = [ctypes.c_void_p]
    lib.aladin_tsv_close.argtypes = [ctypes.c_void_p]
    lib.aladin_tsv_read_features.restype = ctypes.c_int64
    lib.aladin_tsv_read_features.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    try:
        # a stale .so built before wordpiece.cpp (plus a failed rebuild)
        # lacks these symbols; degrade to the tsv-only surface rather than
        # poisoning every native-IO call with AttributeError
        lib.aladin_wp_create.restype = ctypes.c_void_p
        lib.aladin_wp_create.argtypes = [ctypes.c_char_p]
        lib.aladin_wp_destroy.argtypes = [ctypes.c_void_p]
        lib.aladin_wp_vocab_size.restype = ctypes.c_int64
        lib.aladin_wp_vocab_size.argtypes = [ctypes.c_void_p]
        lib.aladin_wp_encode.restype = ctypes.c_int64
        lib.aladin_wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.aladin_has_wordpiece = True
    except AttributeError:
        lib.aladin_has_wordpiece = False
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeFeatureReader:
    """Random-access region-feature reader over (features.tsv, .lineidx).

    Thread- and fork-safe: the C side reads via pread (no shared file
    position, thread_local scratch), and the float output buffer here is
    thread-local - one reader instance serves the loader's whole thread pool.
    """

    def __init__(self, tsv_path: str, max_floats: int = 200 * 2054):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable (run `make -C native`)")
        self._lib = lib
        idx_path = os.path.splitext(tsv_path)[0] + ".lineidx"
        if not os.path.exists(idx_path):
            n = lib.aladin_build_lineidx(tsv_path.encode(), idx_path.encode())
            if n < 0:
                raise IOError(f"failed to index {tsv_path}")
        self._h = lib.aladin_tsv_open(tsv_path.encode(), idx_path.encode())
        if not self._h:
            raise IOError(f"failed to open {tsv_path}")
        self._max_floats = max_floats
        self._tls = threading.local()
        self._paths = (tsv_path, idx_path)

    def num_rows(self) -> int:
        return int(self._lib.aladin_tsv_num_rows(self._h))

    def read_features(self, idx: int) -> np.ndarray:
        buf = getattr(self._tls, "buf", None)
        if buf is None:
            buf = self._tls.buf = np.empty(self._max_floats, np.float32)
        nb = ctypes.c_int64(0)
        n = self._lib.aladin_tsv_read_features(
            self._h, idx, buf.ctypes.data_as(ctypes.c_void_p), buf.size,
            ctypes.byref(nb),
        )
        if n < 0:
            raise IOError(f"row {idx}: decode failed")
        nb = nb.value
        return buf[:n].reshape(nb, -1).copy()

    def close(self):
        if self._h:
            self._lib.aladin_tsv_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeWordPiece:
    """ctypes handle on the C++ WordPiece tokenizer (native/wordpiece.cpp).

    ``encode(text, cap)`` returns the first ``cap`` WordPiece ids of the
    exact sequence the Python tokenizer would produce, or ``None`` when the
    text contains non-ASCII bytes (the caller falls back to Python — same
    output either way, the C path just declines what it can't replicate).

    Read-only after construction: one instance serves the loader's whole
    thread pool (each thread brings its own output buffer).
    """

    def __init__(self, vocab_path: str):
        lib = _load()
        if lib is None or not getattr(lib, "aladin_has_wordpiece", False):
            raise RuntimeError("native IO library unavailable (run `make -C native`)")
        self._lib = lib
        self._h = lib.aladin_wp_create(os.fsencode(vocab_path))
        if not self._h:
            raise IOError(f"failed to load vocab {vocab_path}")
        self._tls = threading.local()

    def vocab_size(self) -> int:
        return int(self._lib.aladin_wp_vocab_size(self._h))

    def encode(self, text: str, cap: int = 512) -> Optional[list]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return None
        buf = getattr(self._tls, "buf", None)
        if buf is None or buf.size < cap:
            buf = self._tls.buf = np.empty(max(cap, 512), np.int32)
        n = self._lib.aladin_wp_encode(
            self._h, raw, len(raw), buf.ctypes.data_as(ctypes.c_void_p), cap
        )
        if n < 0:
            return None
        return buf[:n].tolist()

    def close(self):
        if self._h:
            self._lib.aladin_wp_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def b64_decode_floats(b64: bytes) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((len(b64) * 3) // 4 // 4 + 4, np.float32)
    n = lib.aladin_b64_decode(
        b64, len(b64), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if n < 0:
        return None
    return out[: n // 4].copy()
