"""ctypes bindings for the native host-preprocessing library.

Builds ``libkaolin_tpu_core.so`` from ``csrc/core.cpp`` on first use (g++,
cached next to the source); every entry point has a pure-Python fallback,
so the package works without a compiler.
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = ['get_lib', 'obj_parse_fast', 'points_to_octree_fast',
           'points_to_morton_fast', 'morton_to_points_fast',
           'voxelize_triangles_fast']

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), 'csrc', 'core.cpp')
_OUT = os.path.join(os.path.dirname(__file__), 'csrc',
                    'libkaolin_tpu_core.so')


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _OUT]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded native library, building it if needed;
    None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_OUT) or \
                os.path.getmtime(_OUT) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_OUT)
        lib.obj_count.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.obj_count.restype = ctypes.c_int
        lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.obj_parse.restype = ctypes.c_int
        lib.points_to_morton.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_void_p]
        lib.morton_to_points.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_void_p]
        lib.points_to_octree.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_int, ctypes.c_void_p,
                                         ctypes.c_int64]
        lib.points_to_octree.restype = ctypes.c_int64
        lib.voxelize_triangles.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                           ctypes.c_void_p, ctypes.c_int64,
                                           ctypes.c_int, ctypes.c_void_p,
                                           ctypes.c_int64]
        lib.voxelize_triangles.restype = ctypes.c_int64
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def obj_parse_fast(path):
    """Parses vertices + triangulated faces of an OBJ natively.

    Returns:
        (vertices (V, 3) float32, faces (T, 3) int64, homogeneous_size)
        or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    if lib.obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nt)):
        return None
    vertices = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nt.value, 3), np.int64)
    homo = ctypes.c_int64()
    if lib.obj_parse(path.encode(), vertices.ctypes.data,
                     faces.ctypes.data, ctypes.byref(homo)):
        return None
    return vertices, faces, int(homo.value)


def points_to_morton_fast(points):
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.int16)
    out = np.empty(pts.shape[0], np.int64)
    lib.points_to_morton(pts.ctypes.data, pts.shape[0], out.ctypes.data)
    return out


def morton_to_points_fast(morton):
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(morton, np.int64)
    out = np.empty((m.shape[0], 3), np.int16)
    lib.morton_to_points(m.ctypes.data, m.shape[0], out.ctypes.data)
    return out


def voxelize_triangles_fast(vertices, faces, level):
    """Conservative triangle voxelization (native); None if unavailable.

    Args:
        vertices: (V, 3) float grid-space coords (in [0, 2^level]).
        faces: (T, 3) int.
        level: octree depth (grid res = 2^level).

    Returns:
        (N, 3) int16 sorted unique voxel coords, or None.
    """
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    cap = max(1024, 64 * f.shape[0])
    while True:
        out = np.empty((cap, 3), np.int16)
        n = lib.voxelize_triangles(v.ctypes.data, v.shape[0],
                                   f.ctypes.data, f.shape[0], level,
                                   out.ctypes.data, cap)
        if n >= 0:
            return out[:n].copy()
        cap *= 4


def points_to_octree_fast(points, level):
    """Builds the octree byte stream natively; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.int16)
    cap = max(64, 2 * pts.shape[0] * max(level, 1))
    while True:
        out = np.empty(cap, np.uint8)
        n = lib.points_to_octree(pts.ctypes.data, pts.shape[0], level,
                                 out.ctypes.data, cap)
        if n >= 0:
            return out[:n].copy()
        cap *= 4
