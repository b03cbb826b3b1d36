"""ctypes bindings for the native C++ rasterization core.

Builds `native/rasterize.cpp` with g++ on first use (cached as
`native/librasterize.so`) and exposes numpy-friendly wrappers. The
Python/cv2 path in bevgen_tpu.data.rasterize stays the default;
set BEVGEN_NATIVE_RASTER=1 (or call `enable()`) to route the raster
hot loop through this library. `available()` reports build status.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterable, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "rasterize.cpp"
_LIB = _SRC.with_name("librasterize.so")
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[ctypes.CDLL]:
    global _build_error
    if not _SRC.exists():
        _build_error = f"source missing: {_SRC}"
        return None
    if (not _LIB.exists() or
            _LIB.stat().st_mtime < _SRC.stat().st_mtime):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               str(_SRC), "-o", str(_LIB)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _build_error = getattr(e, "stderr", str(e))
            return None
    lib = ctypes.CDLL(str(_LIB))
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for fn in (lib.fill_polygons, lib.draw_polylines):
        fn.argtypes = [i32p, i32p, ctypes.c_int32, u8p, ctypes.c_int32,
                       ctypes.c_int32, ctypes.c_uint8]
        fn.restype = None
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and _build_error is None:
        _lib = _build()
    return _lib


def available() -> bool:
    return _get() is not None


def build_error() -> Optional[str]:
    _get()
    return _build_error


def _pack(polys: Iterable[np.ndarray]) -> Tuple[np.ndarray, np.ndarray, int]:
    arrs = [np.ascontiguousarray(np.asarray(p, np.int32).reshape(-1, 2))
            for p in polys]
    lens = np.asarray([len(a) for a in arrs], np.int32)
    pts = (np.concatenate(arrs).reshape(-1) if arrs
           else np.zeros(0, np.int32))
    return np.ascontiguousarray(pts), lens, len(arrs)


def fill_polygons(polys, shape: Tuple[int, int]) -> np.ndarray:
    lib = _get()
    assert lib is not None, _build_error
    out = np.zeros(shape, np.uint8)
    pts, lens, n = _pack(polys)
    if n:
        lib.fill_polygons(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            shape[0], shape[1], 1)
    return out


def draw_polylines(lines, shape: Tuple[int, int]) -> np.ndarray:
    lib = _get()
    assert lib is not None, _build_error
    out = np.zeros(shape, np.uint8)
    pts, lens, n = _pack(lines)
    if n:
        lib.draw_polylines(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            shape[0], shape[1], 1)
    return out


def enable():
    """Route bevgen_tpu.data.rasterize through the native core."""
    os.environ["BEVGEN_NATIVE_RASTER"] = "1"
