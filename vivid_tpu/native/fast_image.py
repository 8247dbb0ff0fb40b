"""ctypes binding for the native image kernels, compiled on demand.

resize_bilinear_u8(img_u8 [H,W,3], size) -> float32 [size,size,3] in [0,255],
PIL BILINEAR-equivalent (separable triangle filter with downscale-widened
support). decode_png_rgb(bytes) / load_rgb(path) -> uint8 [H,W,3] via the
native PNG decoder (zlib inflate + unfilter), PIL-fallback for anything it
doesn't cover. Compilation happens once per environment into the package
dir; any failure flips the *_available() probes to False and callers fall
back to PIL.
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
    subprocess.run([cc, "-O3", "-fPIC", "-shared", _SRC, "-o", _LIB, "-lz"],
                   check=True, capture_output=True)


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get("VIVID_NO_NATIVE"):  # force the PIL/numpy paths
            _failed = True
            return None
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.resize_bilinear_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.resize_bilinear_u8.restype = None
            lib.resize_box_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.resize_box_u8.restype = None
            lib.png_dims.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.png_dims.restype = ctypes.c_int
            lib.decode_png_rgb.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.decode_png_rgb.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def fast_resize_available() -> bool:
    return _load() is not None


def png_decode_available() -> bool:
    return _load() is not None


def decode_png_rgb(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to uint8 [H,W,3] RGB with the native decoder
    (8-bit non-interlaced gray/RGB/palette/gray-alpha/RGBA). Raises
    ValueError on unsupported/malformed input — callers fall back to PIL."""
    lib = _load()
    assert lib is not None, "native PNG decoder unavailable"
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_dims(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      ctypes.c_long(buf.size), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"unsupported PNG (code {rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_png_rgb(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(buf.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"PNG decode failed (code {rc})")
    return out


def probe_dims(path: str):
    """(height, width) of an image file WITHOUT decoding pixel data: the
    native PNG header parse needs only the 33-byte IHDR; non-PNG (or
    unsupported PNG) falls back to PIL's lazy open, which also reads just
    the header. Lets dataset code compute crops/intrinsics for frames it
    may never decode (see data/re10k_scenes.LazyFrames)."""
    lib = _load()
    if lib is not None and path.lower().endswith(".png"):
        with open(path, "rb") as f:
            head = f.read(64)
        buf = np.frombuffer(head, np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = lib.png_dims(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          ctypes.c_long(buf.size), ctypes.byref(w),
                          ctypes.byref(h))
        if rc == 0:
            return h.value, w.value
    import PIL.Image
    with PIL.Image.open(path) as im:
        return im.height, im.width


def load_rgb(path: str) -> np.ndarray:
    """Load an image file as uint8 [H,W,3] RGB: native PNG decoder on the
    hot path (the loader is host-bound on small-core machines), PIL for
    everything else (JPEG, interlaced/16-bit PNG, ...)."""
    lib = _load()
    if lib is not None and path.lower().endswith(".png"):
        with open(path, "rb") as f:
            data = f.read()
        try:
            return decode_png_rgb(data)
        except ValueError:
            pass
    import PIL.Image
    return np.asarray(PIL.Image.open(path).convert("RGB"))


def resize_box_u8(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer box-filter downscale: uint8 [H,W,3] -> float32 [H/f,W/f,3],
    the exact f x f area mean (bit-identical to numpy reshape+mean for the
    loader's factors). Raises if the native library is unavailable."""
    lib = _load()
    assert lib is not None, "native resampler unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    assert h % factor == 0 and w % factor == 0, (img.shape, factor)
    out = np.empty((h // factor, w // factor, 3), np.float32)
    lib.resize_box_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(factor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


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
