"""ctypes bridge to the native C++ prefetching image loader.

Builds `native/adaface_loader.cpp` with g++ on first use (cached under
`native/build/`) and exposes `NativeImageLoader`, a threaded
decode+augment prefetcher matching `PersonalizedDataset`'s image-side
semantics (NEAREST resample, flip, center scale, margin shift). Falls back
gracefully: `is_available()` is False when the toolchain or libjpeg/libpng
are absent, and callers keep the pure-python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "adaface_loader.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libadaface_loader.so")

_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpng", "-lz", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_SO)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint8)] * 3
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeImageLoader:
    """Threaded prefetching loader over (image path, mask path) records."""

    def __init__(self, paths: Sequence[str],
                 mask_paths: Sequence[Optional[str]],
                 size: int = 512, flip_p: float = 0.5,
                 scale_range=(0.7, 1.0), seed: int = 0,
                 n_workers: int = 2, queue_capacity: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.size = size
        self.paths: List[str] = list(paths)
        n = len(self.paths)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in self.paths])
        c_masks = (ctypes.c_char_p * n)(
            *[(m.encode() if m else None) for m in mask_paths])
        lo, hi = scale_range if scale_range else (0.0, 0.0)
        self._h = lib.loader_create(c_paths, c_masks, n, size, flip_p,
                                    lo, hi if scale_range else 0.0,
                                    seed, n_workers, queue_capacity)
        self._img = np.empty((size, size, 3), np.uint8)
        self._fg = np.empty((size, size), np.uint8)
        self._aug = np.empty((size, size), np.uint8)

    def next(self):
        """Returns (record_idx, image u8 [S,S,3], fg_mask u8 [S,S],
        aug_mask u8 [S,S]); skips undecodable records."""
        while True:
            idx = self._lib.loader_next(
                self._h,
                self._img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self._fg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self._aug.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if idx == -1:
                continue  # decode failure; reference retries too (`:521-534`)
            if idx == -2:
                raise StopIteration
            return idx, self._img.copy(), self._fg.copy(), self._aug.copy()

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
