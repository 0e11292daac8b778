"""ctypes bindings for the native C++ runtime (native/loader.cpp).

Provides PNG decode and a double-buffered prefetching RGB-D sequence loader.
The library is built on demand with `make -C native` (zlib + g++ only);
everything falls back to the pure-Python paths when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblinemod_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.linemod_decode_png.restype = ctypes.c_long
    lib.linemod_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_void_p,
    ]
    lib.linemod_loader_open.restype = ctypes.c_void_p
    lib.linemod_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.linemod_loader_next.restype = ctypes.c_int
    lib.linemod_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.linemod_loader_close.argtypes = [ctypes.c_void_p]
    lib.linemod_quantize_frame.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def quantize_frame(color_bgr: np.ndarray):
    """Host-side gradient quantization (native/quantize.cpp — bit-identical
    to ops/gradients.py): returns (quant0 [H, W] u8, quant1 [H/2, W/2] u8)
    one-hot orientation maps for both pyramid levels."""
    lib = _load()
    color_bgr = np.ascontiguousarray(color_bgr, np.uint8)
    h, w = color_bgr.shape[:2]
    q0 = np.empty((h, w), np.uint8)
    q1 = np.empty((h // 2, w // 2), np.uint8)
    lib.linemod_quantize_frame(
        color_bgr.ctypes.data_as(ctypes.c_void_p),
        w,
        h,
        q0.ctypes.data_as(ctypes.c_void_p),
        q1.ctypes.data_as(ctypes.c_void_p),
    )
    return q0, q1


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def decode_png(path: str):
    """Decode a PNG via the native library.

    Returns uint8 [H, W, 3] (RGB order as stored) or uint16 [H, W]."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    n = lib.linemod_decode_png(path.encode(), w, h, c, bd, None)
    if n < 0:
        raise IOError(f"native PNG decode failed: {path}")
    buf = np.empty(n, np.uint8)
    lib.linemod_decode_png(
        path.encode(), w, h, c, bd, buf.ctypes.data_as(ctypes.c_void_p)
    )
    if bd.value == 16:
        return buf.view(np.uint16).reshape(h.value, w.value)
    if c.value == 3:
        return buf.reshape(h.value, w.value, 3)
    return buf.reshape(h.value, w.value)


class NativeFrameLoader:
    """Prefetching RGB-D sequence loader: decode of frame i+1 overlaps the
    processing of frame i on a background thread (the native-runtime
    data-loader role of SURVEY §7)."""

    def __init__(self, img_template: str, depth_template: str, width=640, height=480):
        self._lib = _load()
        self._handle = self._lib.linemod_loader_open(
            img_template.encode(), depth_template.encode()
        )
        self.width = width
        self.height = height

    def __iter__(self):
        return self

    def __next__(self):
        color = np.empty((self.height, self.width, 3), np.uint8)
        depth = np.empty((self.height, self.width), np.uint16)
        w = ctypes.c_int()
        h = ctypes.c_int()
        idx = self._lib.linemod_loader_next(
            self._handle,
            color.ctypes.data_as(ctypes.c_void_p),
            depth.ctypes.data_as(ctypes.c_void_p),
            w,
            h,
        )
        if idx < 0:
            raise StopIteration
        # PNG truecolor is RGB; the pipeline works in BGR like the reference
        return color[..., ::-1].copy(), depth

    def close(self):
        if self._handle:
            self._lib.linemod_loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
