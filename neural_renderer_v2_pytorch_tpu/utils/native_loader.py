"""ctypes bindings for the native OBJ parser (native/objparse.cpp).

Builds the shared library lazily with g++ on first use and caches it
under native/build/; falls back to the pure-Python loader when no
compiler is available.  Used automatically by ``load_obj`` for geometry
parsing (vertices + faces); texture/material handling stays in Python
(image decoding dominates there anyway).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SO_PATH = os.path.join(_BUILD_DIR, "libnrobj.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "objparse.cpp")

_lock = threading.Lock()
_lib = None
_failed = False


class _NrObjMesh(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("num_vertices", ctypes.c_long),
        ("faces", ctypes.POINTER(ctypes.c_int)),
        ("num_faces", ctypes.c_long),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("num_uvs", ctypes.c_long),
        ("uv_faces", ctypes.POINTER(ctypes.c_int)),
    ]


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = _SO_PATH + ".tmp"
    subprocess.check_call(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC_PATH],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    os.replace(tmp, _SO_PATH)


def get_lib():
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
            ):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
            lib.nr_parse_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(_NrObjMesh)]
            lib.nr_parse_obj.restype = ctypes.c_int
            lib.nr_free_mesh.argtypes = [ctypes.POINTER(_NrObjMesh)]
            lib.nr_free_mesh.restype = None
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def parse_obj_native(filename):
    """Parse v/f (and vt/f-uv) data with the C++ parser.

    Returns (vertices [nv,3] f32, faces [nf,3] i32, uvs [nt,2] f32 | None,
    uv_faces [nf,3] i32 | None), or None when the native library is
    unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    mesh = _NrObjMesh()
    rc = lib.nr_parse_obj(os.fsencode(filename), ctypes.byref(mesh))
    if rc != 0:
        raise FileNotFoundError(filename if rc == 1 else "%s (read error)" % filename)
    try:
        nv, nf, nt = mesh.num_vertices, mesh.num_faces, mesh.num_uvs
        vertices = np.ctypeslib.as_array(mesh.vertices, (nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(mesh.faces, (nf, 3)).copy() if nf else np.zeros((0, 3), np.int32)
        uvs = None
        uv_faces = None
        if nt and mesh.uvs:
            uvs = np.ctypeslib.as_array(mesh.uvs, (nt, 2)).copy()
        if mesh.uv_faces and nf:
            uv_faces = np.ctypeslib.as_array(mesh.uv_faces, (nf, 3)).copy()
        return vertices, faces, uvs, uv_faces
    finally:
        lib.nr_free_mesh(ctypes.byref(mesh))
