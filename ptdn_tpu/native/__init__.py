"""Native (C++) runtime components, bound via ctypes.

The reference's host runtime is all C++ (scene load, BVH build); here the
performance-relevant host-side pieces get real native implementations:

* bvh_builder.cpp — the SAH BVH builder (the hot part of scene load for
  large meshes), byte-identical output to the NumPy builder.
* obj_loader.cpp — the tinyobjloader role: OBJ parsing with fan
  triangulation, byte-identical output to the Python loader.

The shared library is built on demand with g++ (no pybind11 in the image;
plain C ABI + ctypes). Falls back to the NumPy implementations when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libptdn_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


_SOURCES = ["bvh_builder.cpp", "obj_loader.cpp"]


def _build_library() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", *srcs, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    newest = max(os.path.getmtime(os.path.join(_DIR, f)) for f in _SOURCES)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < newest):
        if not _build_library():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    f32p = ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.ptdn_build_bvh.restype = ctypes.c_int
    lib.ptdn_build_bvh.argtypes = [f32p, f32p, ctypes.c_int64,
                                   f32p, f32p, i32p, i32p, i32p, i32p, i64p]
    i64s = ctypes.POINTER(ctypes.c_int64)
    lib.ptdn_obj_parse.restype = ctypes.c_int
    lib.ptdn_obj_parse.argtypes = [ctypes.c_char_p]
    lib.ptdn_obj_counts.restype = None
    lib.ptdn_obj_counts.argtypes = [i64s, i64s, i64s, i64s]
    lib.ptdn_obj_fill.restype = None
    lib.ptdn_obj_fill.argtypes = [f32p, f32p, f32p, i32p, i32p, i32p]
    lib.ptdn_obj_free.restype = None
    lib.ptdn_obj_free.argtypes = []
    _lib = lib
    return _lib
