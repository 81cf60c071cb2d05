"""Native (C++) runtime pieces, loaded via ctypes.

The TPU compute path is JAX/Pallas; host-side runtime components that the
reference implements natively (the BVH builder, bvh.h:76-125) are C++ here
too.  The shared library is compiled on first use with g++ (cached next to
the source); everything degrades gracefully to the pure-Python implementations
if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libcrt_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    # compile to a per-PID temp then atomically rename: concurrent processes
    # (parallel pytest, two apps on a cold cache) would otherwise trample
    # each other's -o output and cache a truncated .so forever
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, _LIB)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.crt_build_bvh.restype = ctypes.c_int32
        lib.crt_build_bvh.argtypes = [
            f32p, f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint32, f32p, f32p, u8p, i32p, i32p, i32p, i32p, i32p,
            i32p]
        lib.crt_triangle_bounds.restype = None
        lib.crt_triangle_bounds.argtypes = [f32p, f32p, f32p, ctypes.c_int32,
                                            f32p, f32p]
        _lib = lib
        return _lib


def build_bvh_native(prim_min: np.ndarray, prim_max: np.ndarray,
                     leaf_size: int = 2, axis_mode: str = "largest",
                     seed: int = 0):
    """Run the native builder; returns the raw node arrays or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    prim_min = np.ascontiguousarray(prim_min, np.float32)
    prim_max = np.ascontiguousarray(prim_max, np.float32)
    n = prim_min.shape[0]
    cap = max(2 * n, 1)
    bbox_min = np.empty((cap, 3), np.float32)
    bbox_max = np.empty((cap, 3), np.float32)
    is_leaf = np.empty(cap, np.uint8)
    skip = np.empty(cap, np.int32)
    prim0 = np.empty(cap, np.int32)
    prim1 = np.empty(cap, np.int32)
    child_l = np.empty(cap, np.int32)
    child_r = np.empty(cap, np.int32)
    depth = np.empty(cap, np.int32)
    n_nodes = lib.crt_build_bvh(
        prim_min.reshape(-1), prim_max.reshape(-1), n, leaf_size,
        1 if axis_mode == "random" else 0, seed, bbox_min.reshape(-1),
        bbox_max.reshape(-1), is_leaf, skip, prim0, prim1, child_l, child_r,
        depth)
    if n_nodes <= 0:
        return None
    s = slice(0, n_nodes)
    return (bbox_min[s], bbox_max[s], is_leaf[s].astype(bool), skip[s],
            prim0[s], prim1[s], child_l[s], child_r[s], depth[s])
