"""ctypes bridge to the optional C++ IO accelerator (native/io_native.cpp).

The native library accelerates the host-side asset pipeline — the one part of
the reference implemented in native code that has a native-capability
requirement here too (the reference links stb_image for HDR/PNG decode,
RefractionDemo.cpp:111, and parses OBJ with sscanf, Mesh.cpp:14-35).

Everything works without it: each entry point returns None when the shared
library is missing and the pure-Python implementation takes over. Build with
``make -C native`` (see native/Makefile).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATHS = [
    os.path.join(_HERE, "native", "libio_native.so"),
    os.path.join(os.path.dirname(__file__), "libio_native.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("RRT_NO_NATIVE"):
        return None
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            try:
                _bind(lib)
            except AttributeError:
                continue
            _LIB = lib
            break
    return _LIB


def _bind(lib):
    lib.rrt_parse_obj.restype = ctypes.c_void_p
    lib.rrt_parse_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong)]
    lib.rrt_load_hdr.restype = ctypes.c_void_p
    lib.rrt_load_hdr.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.rrt_load_png.restype = ctypes.c_void_p
    lib.rrt_load_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.rrt_free.restype = None
    lib.rrt_free.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def parse_obj(path: str):
    """Returns (positions (T,3,3), normals (T,3,3), uvs (T,3,2)) or None."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return None
    n = ctypes.c_longlong(0)
    ptr = lib.rrt_parse_obj(path.encode(), ctypes.byref(n))
    if not ptr:
        return None
    try:
        t = n.value
        # Layout written by the C++ side: per tri 24 floats = 9 pos, 9 norm,
        # 6 uv.
        buf = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_float)), shape=(t, 24)
        ).copy()
    finally:
        lib.rrt_free(ptr)
    pos = buf[:, 0:9].reshape(t, 3, 3)
    norm = buf[:, 9:18].reshape(t, 3, 3)
    uv = buf[:, 18:24].reshape(t, 3, 2)
    return pos, norm, uv


def load_png(path: str):
    """Returns (H, W, C) uint8/uint16 or None (unsupported subset falls
    back to io/png.py: sub-byte depths, interlaced)."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return None
    h = ctypes.c_longlong(0)
    w = ctypes.c_longlong(0)
    c = ctypes.c_longlong(0)
    d = ctypes.c_longlong(0)
    ptr = lib.rrt_load_png(path.encode(), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c), ctypes.byref(d))
    if not ptr:
        return None
    try:
        ct = ctypes.c_uint16 if d.value == 16 else ctypes.c_uint8
        arr = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ct)),
            shape=(h.value, w.value, c.value),
        ).copy()
    finally:
        lib.rrt_free(ptr)
    return arr


def load_hdr(path: str):
    """Returns (H, W, 3) float32 or None."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return None
    h = ctypes.c_longlong(0)
    w = ctypes.c_longlong(0)
    ptr = lib.rrt_load_hdr(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if not ptr:
        return None
    try:
        arr = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_float)),
            shape=(h.value, w.value, 3),
        ).copy()
    finally:
        lib.rrt_free(ptr)
    return arr
