"""ctypes bindings for the native data-path library (native/vqa_native.cpp).

Builds the shared library with g++ on first use if it isn't present (the
image has no pybind11; the C ABI + ctypes keeps the binding dependency-free).
Every entry point has a pure-Python/numpy fallback — the native path is a
performance optimization for batch assembly and offline graph building,
never a correctness dependency. ``available()`` reports whether the library
loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvqa_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "vqa_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libvqa_native.so"],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.gather_rows_bytes.argtypes = [u8p, i64p, ctypes.c_int64,
                                      ctypes.c_int64, u8p, ctypes.c_int]
    lib.gather_rows_f16_to_f32.argtypes = [u16p, i64p, ctypes.c_int64,
                                           ctypes.c_int64, f32p, ctypes.c_int]
    lib.spatial_relation_graphs.argtypes = [f64p, ctypes.c_int64,
                                            ctypes.c_int64, f64p, f64p, i8p,
                                            ctypes.c_int]
    lib.densify_answers.argtypes = [i64p, i32p, i32p, ctypes.c_int64,
                                    ctypes.c_int64, f32p, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    """Worker threads for the native gathers/scatters.

    Default: up to 32 (each thread sustains ~4-5 GB/s of memcpy-bound
    assembly — PERF.md "Feed economics" — so an 8-thread cap would
    ceiling the int8 feed at ~450k questions/s, below the 941k chip
    rate; 32 leaves headroom past it while staying well under a
    production host's core count). VQA_NATIVE_THREADS overrides for
    machines where the feed should be confined.
    """
    env = os.environ.get("VQA_NATIVE_THREADS")
    if env:
        return max(1, int(env))
    return min(32, os.cpu_count() or 1)


def gather_rows(src: np.ndarray, rows: np.ndarray,
                widen_f16: bool = True) -> np.ndarray:
    """Gather src[rows] into a fresh contiguous array (threaded native path).

    src: [N, ...] (may be a memmap); float16 sources widen to float32 when
    ``widen_f16``. Falls back to numpy fancy indexing without the library.
    """
    lib = _load()
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    row_shape = src.shape[1:]
    row_elems = int(np.prod(row_shape))
    # ctypes pointer math assumes C-contiguous source; memmaps opened by
    # PackedFeatures are, but fall back safely for arbitrary views
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        out = np.asarray(src[rows])
        return out.astype(np.float32) if (widen_f16 and
                                          out.dtype == np.float16) else out

    if src.dtype == np.float16 and widen_f16:
        out = np.empty((len(rows),) + row_shape, np.float32)
        lib.gather_rows_f16_to_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(rows), row_elems,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads())
        return out

    out = np.empty((len(rows),) + row_shape, src.dtype)
    row_bytes = row_elems * src.dtype.itemsize
    lib.gather_rows_bytes(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(rows), row_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _threads())
    return out


def spatial_relation_graphs_native(bbox: np.ndarray, w: np.ndarray,
                                   h: np.ndarray) -> Optional[np.ndarray]:
    """Native [B, N, N] relation labels; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    bbox = np.ascontiguousarray(bbox, np.float64)
    w = np.ascontiguousarray(w, np.float64)
    h = np.ascontiguousarray(h, np.float64)
    B, N, _ = bbox.shape
    out = np.empty((B, N, N), np.int8)
    lib.spatial_relation_graphs(
        bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), B, N,
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), _threads())
    return out


def densify_answers_native(ans_dicts, ans_dim: int) -> Optional[np.ndarray]:
    """Dense soft-score targets from {idx: count} dicts; None w/o library."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.zeros(len(ans_dicts) + 1, np.int64)
    idx_list, cnt_list = [], []
    for r, d in enumerate(ans_dicts):
        for k, v in d.items():
            idx_list.append(int(k))
            cnt_list.append(int(v))
        offsets[r + 1] = len(idx_list)
    indices = np.asarray(idx_list, np.int32)
    counts = np.asarray(cnt_list, np.int32)
    if len(indices) == 0:
        indices = np.zeros(1, np.int32)
        counts = np.zeros(1, np.int32)
    out = np.empty((len(ans_dicts), ans_dim), np.float32)
    lib.densify_answers(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(ans_dicts), ans_dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads())
    return out
