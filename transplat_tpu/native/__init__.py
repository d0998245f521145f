"""ctypes bindings for the native data-loader (threaded JPEG decode).

Builds lazily via make on first use; falls back to None if the toolchain or
libjpeg is unavailable (callers then use the PIL path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libdataloader.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime < (_DIR / "dataloader.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["make", "-C", str(_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.jpeg_shape.restype = ctypes.c_int
        lib.jpeg_shape.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_jpeg_batch.restype = ctypes.c_int
        lib.decode_jpeg_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.resize_bilinear_batch.restype = None
        lib.resize_bilinear_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.resize_lanczos_batch.restype = None
        lib.resize_lanczos_batch.argtypes = lib.resize_bilinear_batch.argtypes
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    blobs: list[bytes], num_threads: int | None = None
) -> np.ndarray | None:
    """Decode same-shaped JPEGs -> (n, h, w, 3) uint8, or None on failure."""
    lib = _load()
    if lib is None or not blobs:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_shape(blobs[0], len(blobs[0]), ctypes.byref(h), ctypes.byref(w)):
        return None
    n = len(blobs)
    data = b"".join(blobs)
    offsets = np.zeros(n, np.int64)
    sizes = np.asarray([len(b) for b in blobs], np.int64)
    offsets[1:] = np.cumsum(sizes)[:-1]
    out = np.empty((n, h.value, w.value, 3), np.uint8)
    threads = num_threads if num_threads is not None else min(os.cpu_count() or 4, 16)
    failures = lib.decode_jpeg_batch(
        data,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.c_char_p),
        h.value,
        w.value,
        threads,
    )
    if failures:
        return None
    return out


def resize_bilinear_batch(
    images: np.ndarray, out_shape: tuple[int, int], num_threads: int | None = None
) -> np.ndarray | None:
    """(n, h, w, 3) u8 -> (n, h2, w2, 3) u8 half-pixel bilinear, or None."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = images.shape
    h2, w2 = out_shape
    out = np.empty((n, h2, w2, 3), np.uint8)
    threads = num_threads if num_threads is not None else min(os.cpu_count() or 4, 16)
    lib.resize_bilinear_batch(
        images.ctypes.data_as(ctypes.c_char_p),
        n,
        h,
        w,
        out.ctypes.data_as(ctypes.c_char_p),
        h2,
        w2,
        threads,
    )
    return out


def resize_lanczos_batch(
    images: np.ndarray, out_shape: tuple[int, int], num_threads: int | None = None
) -> np.ndarray | None:
    """(n, h, w, 3) u8 -> (n, h2, w2, 3) u8 PIL-LANCZOS resize, or None.

    Bit-faithful port of Pillow's separable fixed-point convolution
    (PRECISION_BITS rounding, uint8 intermediate between passes) — the data
    path can replace per-image PIL calls without changing the reference's
    resize semantics (crop_shim.py:80-95)."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = images.shape
    h2, w2 = out_shape
    out = np.empty((n, h2, w2, 3), np.uint8)
    threads = num_threads if num_threads is not None else min(os.cpu_count() or 4, 16)
    lib.resize_lanczos_batch(
        images.ctypes.data_as(ctypes.c_char_p),
        n,
        h,
        w,
        out.ctypes.data_as(ctypes.c_char_p),
        h2,
        w2,
        threads,
    )
    return out
