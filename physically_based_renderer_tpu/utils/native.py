"""Loader for the native C++ components (ctypes bindings).

The reference ships its loaders as vendored C++ (tinyobjloader, stb, WIC
wrappers); our native layer lives in ``native/`` and is built lazily with
g++ the first time it's needed. Every native component has a pure-Python
fallback, so the package works without a toolchain (the fallback is used
automatically if compilation fails).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_lock = threading.Lock()
_libs: dict[str, ctypes.CDLL | None] = {}


def _build(lib: str, source: str) -> str | None:
    so_path = os.path.join(_NATIVE_DIR, lib)
    src_path = os.path.join(_NATIVE_DIR, source)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-o", so_path, src_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so_path
    except Exception:
        return None


def load_objparse() -> ctypes.CDLL | None:
    """The OBJ parser library, or None if unavailable (use the fallback)."""
    with _lock:
        if "objparse" in _libs:
            return _libs["objparse"]
        lib = None
        path = _build("libobjparse.so", "objparse.cpp")
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
                lib.obj_parse_file.restype = ctypes.c_void_p
                lib.obj_parse_file.argtypes = [ctypes.c_char_p]
                for fn in (
                    "obj_vertex_count",
                    "obj_tri_count",
                    "obj_material_count",
                    "obj_mtllib_count",
                    "obj_has_normals",
                    "obj_has_uvs",
                ):
                    getattr(lib, fn).restype = ctypes.c_int32
                    getattr(lib, fn).argtypes = [ctypes.c_void_p]
                for fn in ("obj_copy_positions", "obj_copy_normals", "obj_copy_uvs"):
                    getattr(lib, fn).restype = None
                    getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
                for fn in ("obj_copy_tris", "obj_copy_face_material"):
                    getattr(lib, fn).restype = None
                    getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
                for fn in ("obj_material_name", "obj_mtllib_name"):
                    getattr(lib, fn).restype = ctypes.c_char_p
                    getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int32]
                lib.obj_error.restype = ctypes.c_char_p
                lib.obj_error.argtypes = [ctypes.c_void_p]
                lib.obj_free.restype = None
                lib.obj_free.argtypes = [ctypes.c_void_p]
            except OSError:
                lib = None
        _libs["objparse"] = lib
        return lib
