"""ctypes bindings for the C++ WordPiece batch tokenizer (native/wordpiece.cpp).

The shared library is built on demand with g++ (cached next to the source);
environments without a toolchain silently fall back to the pure-Python
tokenizer. Non-ASCII texts always route to Python (the native path implements
the ASCII fast path only), so outputs are identical either way.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "wordpiece.cpp"
_LIB = _NATIVE_DIR / "libwordpiece.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _load_library() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            lib.wp_encode_batch.restype = ctypes.c_int32
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception as exc:  # noqa: BLE001 - any failure disables the fast path
            logger.info("native wordpiece unavailable (%s); using pure Python", exc)
            _lib_failed = True
        return _lib


class NativeWordPiece:
    """Native tokenizer over a BERT-format vocab. None-able: see ``create``."""

    def __init__(self, lib: ctypes.CDLL, handle: int):
        self._lib = lib
        self._handle = handle

    @classmethod
    def create(
        cls,
        vocab: dict[str, int],
        lowercase: bool,
        pad_id: int,
        unk_id: int,
        cls_id: int,
        sep_id: int,
    ) -> "NativeWordPiece | None":
        lib = _load_library()
        if lib is None:
            return None
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        if [i for _, i in ordered] != list(range(len(ordered))):
            return None  # non-contiguous ids; keep Python path
        arr = (ctypes.c_char_p * len(ordered))(
            *[t.encode("utf-8") for t, _ in ordered]
        )
        handle = lib.wp_create(arr, len(ordered), int(lowercase), pad_id, unk_id, cls_id, sep_id)
        if not handle:
            return None
        return cls(lib, handle)

    def encode_batch(
        self, texts: list[str], max_len: int, n_rows: int, pad_id: int
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """(ids [n_rows, max_len], mask, longest) — padding rows zero/pad-filled."""
        ids = np.full((n_rows, max_len), pad_id, dtype=np.int32)
        mask = np.zeros((n_rows, max_len), dtype=np.int32)
        arr = (ctypes.c_char_p * len(texts))(*[t.encode("utf-8") for t in texts])
        longest = self._lib.wp_encode_batch(
            self._handle,
            arr,
            len(texts),
            max_len,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask, int(longest)

    def __del__(self):
        try:
            self._lib.wp_destroy(self._handle)
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass
