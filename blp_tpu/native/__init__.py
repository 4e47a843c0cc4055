"""ctypes bindings for the native C++ data packer (native/packer.cpp).

Builds the shared library on first use with g++ -O3 (no pybind11 in this
environment; plain C ABI + ctypes). All entry points have pure-Python
fallbacks — `available()` gates usage, nothing hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_SRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                "native", "packer.cpp")
_LIB_DIR = osp.join(osp.dirname(_SRC), "build")
_LIB = osp.join(_LIB_DIR, "libblp_packer.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not osp.exists(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.pack_triples.restype = ctypes.c_int64
        lib.pack_triples.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int64]
        lib.count_lines.restype = ctypes.c_int64
        lib.count_lines.argtypes = [ctypes.c_char_p]
        lib.wordpiece_encode_file.restype = ctypes.c_int64
        lib.wordpiece_encode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pack_triples(triples_path: str, entities_path: str,
                 relations_path: str) -> np.ndarray | None:
    """(T, 3) int32 [head, tail, rel] triples, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    cap = lib.count_lines(triples_path.encode())
    if cap < 0:
        return None
    out = np.zeros((max(cap, 1), 3), np.int32)
    n = lib.pack_triples(triples_path.encode(), entities_path.encode(),
                         relations_path.encode(),
                         out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    return out[:n]


def wordpiece_encode_file(text_path: str, entities_path: str, vocab_path: str,
                          *, max_len: int, do_lower: bool,
                          text_data: np.ndarray) -> np.ndarray | None:
    """Tokenize an entity2text TSV into `text_data` ((N, max_len+1) int32,
    zero-initialized, modified in place). Returns a bool mask of rows that
    contain non-ASCII text and must be handled by the Python tokenizer, or
    None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    assert text_data.dtype == np.int32 and text_data.flags.c_contiguous
    needs_python = np.zeros(text_data.shape[0], np.uint8)
    n = lib.wordpiece_encode_file(
        text_path.encode(), entities_path.encode(), vocab_path.encode(),
        max_len, int(do_lower),
        text_data.ctypes.data_as(ctypes.c_void_p),
        needs_python.ctypes.data_as(ctypes.c_void_p),
        text_data.shape[0])
    if n < 0:
        return None
    return needs_python.astype(bool)
