"""Native (C++) host-side components, loaded via ctypes.

Currently: the fast WordPiece tokenizer (wordpiece.cpp). The library builds
on first use with the system compiler; if no compiler is available the
callers fall back to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_lib() -> Optional[str]:
    src = os.path.join(_HERE, "wordpiece.cpp")
    out = os.path.join(_HERE, "libravqa_native.so")
    if os.path.exists(out) and os.path.getmtime(out) > os.path.getmtime(src):
        return out
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run([cc, "-O2", "-shared", "-fPIC", "-std=c++17",
                            "-pthread", src, "-o", out], check=True,
                           capture_output=True)
            return out
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    path = _build_lib()
    if path is None:
        _BUILD_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    lib.wp_load_vocab.restype = ctypes.c_int32
    lib.wp_load_vocab.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.wp_encode_batch.restype = None
    lib.wp_encode_batch.argtypes = [
        ctypes.c_int32, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32)]
    _LIB = lib
    return lib


class FastWordPiece:
    """C++ WordPiece encoder over a vocab.txt. Handles ASCII + CJK
    ideographs + common fullwidth punctuation natively; rows containing
    other non-ASCII codepoints come back with len -1 (the caller
    re-encodes them with the Python reference implementation)."""

    def __init__(self, vocab_path: str, unk_id: int = 100):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("no C++ compiler available")
        self.lib = lib
        self.handle = lib.wp_load_vocab(vocab_path.encode(), unk_id)
        if self.handle < 0:
            raise FileNotFoundError(vocab_path)

    def encode_batch(self, texts: Sequence[str], maxlen: int):
        """-> (ids (n, maxlen) int32 zero-padded, lens (n,) int32;
        lens[i] == -1 marks a row the caller must re-encode in Python)."""
        n = len(texts)
        # NUL would terminate the C string; the Python reference DROPS
        # NUL (cp==0 -> continue, joining the surrounding word), so strip
        # rather than substitute a space (which would split the word)
        bufs = [t.replace("\x00", "").encode("utf-8") for t in texts]
        offsets = np.zeros(n, np.int64)
        pos = 0
        blob = bytearray()
        for i, b in enumerate(bufs):
            offsets[i] = pos
            blob += b + b"\x00"
            pos += len(b) + 1
        ids = np.zeros((n, maxlen), np.int32)
        lens = np.zeros(n, np.int32)
        self.lib.wp_encode_batch(self.handle, bytes(blob), offsets, n,
                                 maxlen, ids, lens)
        return ids, lens
