"""ctypes loader for the native C++ helpers (offset scan, top-k merge).

Falls back to numpy implementations when the shared library is missing.
The library is built lazily from ``native/scanner.cpp`` with g++ on first
use and cached beside the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdprnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_NATIVE_DIR, "scanner.cpp")
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
            ):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.SubprocessError):
            return None
        lib.dpr_count_lines.restype = ctypes.c_int64
        lib.dpr_count_lines.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.dpr_scan_offsets.restype = ctypes.c_int64
        lib.dpr_scan_offsets.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
        ]
        lib.dpr_merge_topk.restype = None
        lib.dpr_merge_topk.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def scan_line_offsets(buf, size: int) -> np.ndarray:
    """Byte offsets of every line start in ``buf[0:size]`` as uint64.

    ``buf`` is anything exposing the buffer protocol (mmap, bytes).
    """
    if size == 0:
        return np.zeros((0,), dtype=np.uint64)
    # View the (possibly read-only) buffer without copying; numpy handles
    # read-only buffers where ctypes.from_buffer would not.
    arr = np.frombuffer(buf, dtype=np.uint8, count=size)
    lib = _load()
    if lib is not None:
        raw = arr.ctypes.data_as(ctypes.c_char_p)
        n = lib.dpr_count_lines(raw, size)
        out = np.empty((n,), dtype=np.uint64)
        written = lib.dpr_scan_offsets(
            raw,
            size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n,
        )
        return out[:written]
    # numpy fallback
    nl = np.flatnonzero(arr == 0x0A)
    starts = nl + 1
    starts = starts[starts < size]
    return np.concatenate([[0], starts]).astype(np.uint64)


def merge_topk(
    shard_scores: np.ndarray, shard_ids: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-shard descending top-k lists into a global top-k.

    ``shard_scores``: (num_shards, k) float32, each row sorted descending.
    ``shard_ids``:    (num_shards, k) int64 global ids.
    Returns (scores, ids) of shape (k,).
    """
    shard_scores = np.ascontiguousarray(shard_scores, dtype=np.float32)
    shard_ids = np.ascontiguousarray(shard_ids, dtype=np.int64)
    nshards, kk = shard_scores.shape
    assert kk == k
    lib = _load()
    if lib is not None:
        out_s = np.empty((k,), dtype=np.float32)
        out_i = np.empty((k,), dtype=np.int64)
        lib.dpr_merge_topk(
            shard_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            shard_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nshards,
            k,
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out_s, out_i
    flat_s = shard_scores.reshape(-1)
    flat_i = shard_ids.reshape(-1)
    order = np.argsort(-flat_s, kind="stable")[:k]
    return flat_s[order], flat_i[order]
