"""ctypes bindings for the native host-geometry library (native/).

Lazily builds `native/libfrenetix_host.so` via `make` on first use; every
entry point has a pure-NumPy fallback so the framework works without a
toolchain.  See native/host_geometry.cc for what lives natively and why.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["load", "available", "corridor_scan", "points_in_polygons",
           "rasterize_polylines"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfrenetix_host.so")
_lib = None
_tried = False


def load():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.points_in_polygons.argtypes = [dp, ctypes.c_int64, dp, ip,
                                           ctypes.c_int64, u8p]
        lib.corridor_scan.argtypes = [dp, dp, ctypes.c_int64, dp, ip,
                                      ctypes.c_int64, ctypes.c_double,
                                      ctypes.c_double, dp]
        lib.rasterize_polylines.argtypes = [dp, ip, dp, ctypes.c_int64,
                                            ctypes.c_double, ctypes.c_double,
                                            ctypes.c_double, ctypes.c_double,
                                            ctypes.c_int, fp]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def _pack_polygons(polygons):
    offsets = np.zeros(len(polygons) + 1, np.int64)
    for i, p in enumerate(polygons):
        offsets[i + 1] = offsets[i] + len(p)
    flat = (
        np.concatenate(polygons, axis=0).astype(np.float64)
        if polygons
        else np.zeros((0, 2))
    )
    return np.ascontiguousarray(flat), offsets


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def corridor_scan(xy, theta, polygons, d_max=8.0, d_step=0.25):
    """Native drivable-corridor scan; (R, 2) d_min/d_max."""
    lib = load()
    if lib is None:
        return None
    xy = np.ascontiguousarray(np.asarray(xy, np.float64))
    theta = np.ascontiguousarray(np.asarray(theta, np.float64))
    flat, offsets = _pack_polygons(polygons)
    out = np.zeros((len(xy), 2), np.float64)
    lib.corridor_scan(
        _dp(xy), _dp(theta), len(xy), _dp(flat), _ip(offsets), len(polygons),
        float(d_max), float(d_step), _dp(out),
    )
    return out


def points_in_polygons(points, polygons):
    lib = load()
    if lib is None:
        return None
    points = np.ascontiguousarray(np.asarray(points, np.float64))
    flat, offsets = _pack_polygons(polygons)
    out = np.zeros(len(points), np.uint8)
    lib.points_in_polygons(
        _dp(points), len(points), _dp(flat), _ip(offsets), len(polygons),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def rasterize_polylines(lines, values, pos, orient, watch_radius, res):
    lib = load()
    if lib is None:
        return None
    flat, offsets = _pack_polygons(lines)
    values = np.ascontiguousarray(np.asarray(values, np.float64))
    img = np.zeros((res, res), np.float32)
    lib.rasterize_polylines(
        _dp(flat), _ip(offsets), _dp(values), len(lines),
        float(pos[0]), float(pos[1]), float(orient), float(watch_radius),
        int(res), img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return img
