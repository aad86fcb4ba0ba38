"""ctypes bindings for the native C++ host runtime library.

Builds ``native/*.cc`` on demand (g++ -O3 -shared) into one shared object and
exposes PIL-compatible bicubic resize + fused pad/normalize/CHW conversion
(image_ops.cc) and sentencepiece-unigram Viterbi segmentation (spm_ops.cc).
Falls back silently when no compiler is available — the pure-Python paths
stay the reference implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRCS = [
    os.path.join(_REPO_ROOT, "native", "image_ops.cc"),
    os.path.join(_REPO_ROOT, "native", "spm_ops.cc"),
]
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libaria_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", *_SRCS, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ARIA_TPU_NATIVE", "1") == "0":
            return None
        stale = not os.path.exists(_LIB_PATH) or any(
            os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
            for s in _SRCS
        )
        if stale:
            if not all(os.path.exists(s) for s in _SRCS) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.aria_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.aria_pad_normalize_chw.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.aria_spm_create.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.aria_spm_create.restype = ctypes.c_void_p
        lib.aria_spm_destroy.argtypes = [ctypes.c_void_p]
        lib.aria_spm_segment.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.aria_spm_segment.restype = ctypes.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def resize_bicubic(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """src: [H, W, C] uint8 -> [dh, dw, C] uint8, PIL-BICUBIC-compatible."""
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    h, w, c = src.shape
    dst = np.empty((dh, dw, c), np.uint8)
    lib.aria_resize_bicubic(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    return dst


def pad_normalize_chw(
    src: np.ndarray, size: int,
    mean: Tuple[float, float, float], std: Tuple[float, float, float],
) -> Tuple[np.ndarray, np.ndarray]:
    """src: [h, w, 3] uint8 -> ([3, size, size] float32, [size, size] bool)."""
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    h, w, _ = src.shape
    out = np.empty((3, size, size), np.float32)
    mask = np.empty((size, size), np.uint8)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.aria_pad_normalize_chw(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, size,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, mask.astype(bool)
