"""Batch JPEG decoding: native libjpeg extension with cv2 fallback.

The native path (syncvsr_tpu/native/jpeg_batch.cpp) decodes every frame of a
clip in one ctypes call with a worker-thread pool — the TurboJPEG role of the
reference's loader (LRW/video/src/data.py:41) without per-frame Python
overhead. Compiled on first use and cached beside the source; any build or
load failure silently falls back to cv2.imdecode.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "jpeg_batch.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libjpegbatch.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC,
             "-ljpeg", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB)
            lib.decode_gray_batch.restype = ctypes.c_int
            lib.decode_gray_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int,
                ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def jpeg_dimensions(buf: bytes) -> Tuple[int, int]:
    """(height, width) from JPEG SOF markers, no decode."""
    i = 2
    n = len(buf)
    while i + 9 < n:
        if buf[i] != 0xFF:
            i += 1
            continue
        marker = buf[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = (buf[i + 5] << 8) | buf[i + 6]
            w = (buf[i + 7] << 8) | buf[i + 8]
            return h, w
        length = (buf[i + 2] << 8) | buf[i + 3]
        i += 2 + length
    raise ValueError("no SOF marker found")


def decode_gray_batch(jpegs: Sequence[bytes], height: Optional[int] = None,
                      width: Optional[int] = None,
                      num_threads: int = 0) -> np.ndarray:
    """Decode a list of grayscale JPEGs -> uint8 [N, H, W, 1]."""
    if not jpegs:
        raise ValueError("empty jpeg list")
    if height is None or width is None:
        height, width = jpeg_dimensions(jpegs[0])

    lib = _load()
    if lib is not None:
        n = len(jpegs)
        out = np.empty((n, height, width), np.uint8)
        bufs = (ctypes.c_char_p * n)(*jpegs)
        sizes = (ctypes.c_size_t * n)(*[len(b) for b in jpegs])
        threads = num_threads or min(os.cpu_count() or 1, 8)
        rc = lib.decode_gray_batch(bufs, sizes, n,
                                   out.ctypes.data_as(ctypes.c_void_p),
                                   height, width, threads)
        if rc == 0:
            return out[..., None]
        # fall through to cv2 on decode error

    import cv2

    frames = []
    for b in jpegs:
        img = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise ValueError("jpeg decode failed")
        f = np.zeros((height, width), np.uint8)
        h = min(img.shape[0], height)
        w = min(img.shape[1], width)
        f[:h, :w] = img[:h, :w]
        frames.append(f)
    return np.stack(frames)[..., None]


def native_available() -> bool:
    return _load() is not None
