"""ctypes binding for the C++ host runtime (native/sparkl_host.cpp).

Builds lazily with g++ on first use (cached .so next to the source);
callers fall back to the numpy implementations when the toolchain or the
library is unavailable, so the framework stays pure-Python-functional.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "sparkl_host.cpp")
_SO = os.path.join(_REPO, "native", "libsparkl_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO, _SRC, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)


def get_lib():
    """Returns the loaded library or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.sparkl_cube_particles.restype = ctypes.c_int64
            lib.sparkl_calibrate_blocks.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def cube_particles(origin, counts, radius, randomize=False, seed=0):
    """Native lattice sampler; returns float32 [n, dim] or None."""
    lib = get_lib()
    if lib is None:
        return None
    dim = len(counts)
    origin = np.asarray(origin, np.float64)
    counts = np.asarray(counts, np.int64)
    n = int(np.prod(counts))
    out = np.empty((n, dim), np.float32)
    lib.sparkl_cube_particles(
        _ptr(origin, ctypes.c_double), _ptr(counts, ctypes.c_int64),
        ctypes.c_int(dim), ctypes.c_double(radius), ctypes.c_int(int(randomize)),
        ctypes.c_uint64(seed), _ptr(out, ctypes.c_float),
    )
    return out


def polygon_contains(poly, pts):
    """Native even-odd containment; returns bool [m] or None."""
    lib = get_lib()
    if lib is None:
        return None
    poly = np.ascontiguousarray(poly, np.float32)
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty((len(pts),), np.uint8)
    lib.sparkl_polygon_contains(
        _ptr(poly, ctypes.c_float), ctypes.c_int64(len(poly)),
        _ptr(pts, ctypes.c_float), ctypes.c_int64(len(pts)),
        _ptr(out, ctypes.c_uint8),
    )
    return out.astype(bool)


def morton_codes(pos, origin, cell_width):
    """Native morton codes; returns uint64 [n] or None."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    n, dim = pos.shape
    origin = np.asarray(origin, np.float32)
    out = np.empty((n,), np.uint64)
    lib.sparkl_morton_codes(
        _ptr(pos, ctypes.c_float), ctypes.c_int64(n), ctypes.c_int(dim),
        _ptr(origin, ctypes.c_float), ctypes.c_float(1.0 / cell_width),
        _ptr(out, ctypes.c_uint64),
    )
    return out


def calibrate_blocks(pos, active, origin, cell_width, res, block_side, chunk_size):
    """Native block-table sizing; returns (n_blocks, n_chunks, n_grid) or None."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    active = np.ascontiguousarray(active, np.uint8)
    n, dim = pos.shape
    origin = np.asarray(origin, np.float64)
    res = np.asarray(res, np.int64)
    out = np.zeros((3,), np.int64)
    rc = lib.sparkl_calibrate_blocks(
        _ptr(pos, ctypes.c_float), _ptr(active, ctypes.c_uint8),
        ctypes.c_int64(n), ctypes.c_int(dim), _ptr(origin, ctypes.c_double),
        ctypes.c_double(cell_width), _ptr(res, ctypes.c_int64),
        ctypes.c_int(block_side), ctypes.c_int(chunk_size),
        _ptr(out, ctypes.c_int64),
    )
    if rc != 0:
        return None
    return int(out[0]), int(out[1]), int(out[2])
