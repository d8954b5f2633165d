"""ctypes wrapper around the native triangle BVH (native/bvh.cpp).

Builds the shared library on first use (g++, cached next to the
source). Host-side replacement for the reference's GPU TriangleBvh
(triangle_bvh.cu) — see native/bvh.cpp for the design note.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "bvh.cpp"

_lib = None


def _lib_path() -> Path:
    """Cache key = hash of (source, host arch): a fresh clone or a
    different CPU always rebuilds (-march=native binaries are not
    portable), and binaries never need to be committed."""
    import hashlib
    import platform

    h = hashlib.sha256()
    h.update(_SRC.read_bytes())
    h.update(platform.machine().encode())
    h.update(platform.processor().encode())
    return _NATIVE_DIR / f"libngpbvh-{h.hexdigest()[:12]}.so"


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib_path = _lib_path()
    if not lib_path.exists():
        tmp = lib_path.with_suffix(".so.tmp")
        cmd = [
            "g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
            "-shared", "-fPIC", "-o", str(tmp), str(_SRC), "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        tmp.replace(lib_path)  # atomic vs concurrent builders
    lib = ctypes.CDLL(str(lib_path))
    lib.bvh_create.restype = ctypes.c_void_p
    lib.bvh_create.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.bvh_destroy.argtypes = [ctypes.c_void_p]
    lib.bvh_signed_distance.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.bvh_closest_points.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bvh_raytrace.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.bvh_inside.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


SDF_MODES = {
    "unsigned": 0,
    "watertight": 1,
    "raystab": 2,
    "pathescape": 2,
    "pseudonormal": 3,
}


class TriangleBvh:
    """BVH over a triangle soup (N, 3, 3) float32."""

    def __init__(self, triangles: np.ndarray):
        self.triangles = np.ascontiguousarray(triangles, np.float32).reshape(-1, 3, 3)
        self._lib = _load_lib()
        self._handle = self._lib.bvh_create(
            _fptr(self.triangles.reshape(-1)), len(self.triangles)
        )

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bvh_destroy(self._handle)
            self._handle = None

    def signed_distance(self, points: np.ndarray, mode: str = "raystab") -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
        out = np.empty(len(pts), np.float32)
        self._lib.bvh_signed_distance(
            self._handle, _fptr(pts), len(pts), SDF_MODES[mode], _fptr(out)
        )
        return out

    def closest_points(self, points: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
        out = np.empty_like(pts)
        self._lib.bvh_closest_points(self._handle, _fptr(pts), len(pts), _fptr(out))
        return out

    def raytrace(self, origins: np.ndarray, dirs: np.ndarray):
        o = np.ascontiguousarray(origins, np.float32).reshape(-1, 3)
        d = np.ascontiguousarray(dirs, np.float32).reshape(-1, 3)
        t = np.empty(len(o), np.float32)
        tri = np.empty(len(o), np.int32)
        self._lib.bvh_raytrace(
            self._handle, _fptr(o), _fptr(d), len(o), _fptr(t),
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return t, tri

    def inside(self, points: np.ndarray, mode: str = "raystab") -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
        out = np.empty(len(pts), np.uint8)
        self._lib.bvh_inside(
            self._handle, _fptr(pts), len(pts), SDF_MODES[mode],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out.astype(bool)
