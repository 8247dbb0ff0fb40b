"""ctypes binding for the native image resampler, compiled on demand.

resize_bilinear_u8(img_u8 [H,W,3], size) -> float32 [size,size,3] in [0,255],
PIL BILINEAR-equivalent (separable triangle filter with downscale-widened
support). Compilation happens once per environment into the package dir;
any failure flips `fast_resize_available()` to False and callers fall back
to PIL.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_image.c")
_LIB = os.path.join(_HERE, "libfast_image.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build():
    cc = os.environ.get("CC", "cc")
    subprocess.run([cc, "-O3", "-fPIC", "-shared", _SRC, "-o", _LIB],
                   check=True, capture_output=True)


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.resize_bilinear_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.resize_bilinear_u8.restype = None
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def fast_resize_available() -> bool:
    return _load() is not None


def resize_bilinear_u8(img: np.ndarray, size: int) -> np.ndarray:
    """img: uint8 [H,W,3] -> float32 [size,size,3]. Raises if the native
    library is unavailable (callers check fast_resize_available())."""
    lib = _load()
    assert lib is not None, "native resampler unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    lib.resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(size))
    return out
