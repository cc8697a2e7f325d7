"""ctypes bindings for the C++ WordPiece batch tokenizer (native/wordpiece.cpp).

The shared library is built on demand with g++ (cached next to the source);
environments without a toolchain silently fall back to the pure-Python
tokenizer. The native path handles full Unicode via classification/transform
tables generated from Python's own ``unicodedata`` (unicode_tables.py);
rows containing context-sensitive codepoints are bailed back to Python, so
outputs are identical to the pure-Python tokenizer for every input.
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

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


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
                ctypes.POINTER(ctypes.c_char_p),  # tokens
                ctypes.c_int32,  # n
                ctypes.c_int32,  # pad_id
                ctypes.c_int32,  # unk_id
                ctypes.c_int32,  # cls_id
                ctypes.c_int32,  # sep_id
                _u8p,  # flags[65536]
                _i32p,  # xform[65536]
                _i32p,  # exc_cp
                _i32p,  # exc_off
                _i32p,  # exc_dat
                ctypes.c_int32,  # n_exc
                _i32p,  # astral_starts
                _u8p,  # astral_class
                ctypes.c_int32,  # n_astral
            ]
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            lib.wp_encode_batch.restype = ctypes.c_int32
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int32,
                ctypes.c_int32,
                _i32p,
                _i32p,
                ctypes.POINTER(ctypes.c_int8),
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
        try:
            arr = (ctypes.c_char_p * len(ordered))(
                *[t.encode("utf-8") for t, _ in ordered]
            )
        except UnicodeEncodeError:
            return None
        from instacart_next_order_recommendation_tpu.tokenizer.unicode_tables import (
            build_tables,
        )

        t = build_tables(lowercase)
        flags = np.ascontiguousarray(t["flags"], np.uint8)
        xform = np.ascontiguousarray(t["xform"], np.int32)
        exc_cp = np.ascontiguousarray(t["exc_cp"], np.int32)
        exc_off = np.ascontiguousarray(t["exc_off"], np.int32)
        exc_dat = np.ascontiguousarray(t["exc_dat"], np.int32)
        astral_starts = np.ascontiguousarray(t["astral_starts"], np.int32)
        astral_class = np.ascontiguousarray(t["astral_class"], np.uint8)
        handle = lib.wp_create(
            arr,
            len(ordered),
            pad_id,
            unk_id,
            cls_id,
            sep_id,
            flags.ctypes.data_as(_u8p),
            xform.ctypes.data_as(_i32p),
            exc_cp.ctypes.data_as(_i32p),
            exc_off.ctypes.data_as(_i32p),
            exc_dat.ctypes.data_as(_i32p),
            len(exc_cp),
            astral_starts.ctypes.data_as(_i32p),
            astral_class.ctypes.data_as(_u8p),
            len(astral_starts),
        )
        if not handle:
            return None
        return cls(lib, handle)

    def encode_batch(
        self, texts: list[str], max_len: int, n_rows: int, pad_id: int
    ) -> tuple[np.ndarray, np.ndarray, int, np.ndarray] | None:
        """(ids [n_rows, max_len], mask, longest, bailed [len(texts)]).

        ``bailed[i]`` marks rows the native path could not prove identical to
        Python (context-sensitive codepoints); their ids/mask rows are
        pad-filled and the caller re-encodes them. Returns None when the
        texts cannot be UTF-8 encoded at all (lone surrogates).
        """
        ids = np.full((n_rows, max_len), pad_id, dtype=np.int32)
        mask = np.zeros((n_rows, max_len), dtype=np.int32)
        bailed = np.zeros(len(texts), dtype=np.int8)
        try:
            arr = (ctypes.c_char_p * len(texts))(*[t.encode("utf-8") for t in texts])
        except UnicodeEncodeError:
            return None
        longest = self._lib.wp_encode_batch(
            self._handle,
            arr,
            len(texts),
            max_len,
            ids.ctypes.data_as(_i32p),
            mask.ctypes.data_as(_i32p),
            bailed.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        return ids, mask, int(longest), bailed

    def __del__(self):
        try:
            self._lib.wp_destroy(self._handle)
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass
