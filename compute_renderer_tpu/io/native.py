"""ctypes binding to the native C++ OBJ parser (compute_renderer_tpu/native).

The parser implements the same contract as ``io/obj.py`` (tobj
triangulate+single_index semantics); measured ~9x faster than the Python
loader on a San-Miguel-class 1M-tri / 115 MB OBJ (1.9 s vs 16.6 s — see
scripts/bench_obj_parse.py and BASELINE.md "OBJ parse").
Built on demand via ``make -C compute_renderer_tpu/native``; this module
gracefully reports unavailability if the shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

from compute_renderer_tpu.core.maths import F32
from compute_renderer_tpu.core.types import Mesh

_LIB = None
_TRIED = False


def _lib_path() -> Path:
    return Path(__file__).resolve().parent.parent / "native" / "libobjparse.so"


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    p = _lib_path()
    if not p.exists():
        return None
    try:
        lib = ctypes.CDLL(str(p))
    except OSError:
        return None
    lib.crt_load_obj.restype = ctypes.c_void_p
    lib.crt_load_obj.argtypes = [ctypes.c_char_p]
    lib.crt_mesh_counts.restype = None
    lib.crt_mesh_counts.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.crt_mesh_fill.restype = None
    lib.crt_mesh_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.crt_mesh_free.restype = None
    lib.crt_mesh_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    if os.environ.get("CRT_DISABLE_NATIVE"):
        return False
    return _load() is not None


def load_obj(path) -> Mesh:
    lib = _load()
    if lib is None:
        raise RuntimeError("native objparse library not built")
    handle = lib.crt_load_obj(str(path).encode())
    if not handle:
        raise IOError(f"native OBJ parse failed for {path}")
    try:
        nverts = ctypes.c_int64()
        nindices = ctypes.c_int64()
        lib.crt_mesh_counts(handle, ctypes.byref(nverts), ctypes.byref(nindices))
        nv, ni = nverts.value, nindices.value
        positions = np.empty((nv, 3), dtype=F32)
        normals = np.empty((nv, 3), dtype=F32)
        uvs = np.empty((nv, 2), dtype=F32)
        indices = np.empty((ni,), dtype=np.uint32)
        lib.crt_mesh_fill(
            handle,
            positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return Mesh(positions, normals, uvs, indices)
    finally:
        lib.crt_mesh_free(handle)
