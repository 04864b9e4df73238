"""ctypes binding to the system libwebp — the in-container reference
codec for LOSSY WebP (VP8) and the production decode path for WebP
shapes outside the pure-Python codecs' scope (VP8X extended container).

Role split (round 15):

- ``functions/webp.py``  — pure-Python VP8L (lossless): deterministic
  everywhere, no native dependency; stays FIRST in the decode dispatch.
- ``functions/vp8.py``   — pure-Python VP8 keyframe decoder (RFC 6386):
  deterministic everywhere; validated BIT-EXACTLY against this binding.
- this module           — the independent oracle for vp8.py's tests
  (encode real bitstreams, decode them with the reference
  implementation) and the loud-when-absent fallback for wild WebP
  variants (VP8X, animation) that remain out of pure-Python scope.

libwebp is a public BSD-licensed system library; nothing here is
pip-installed. Every entry point raises ImportError with the library
name when the .so is absent — the PIL-seam convention
(operators/multimodal.py) applied to the native codec.

No reference analogue (the reference is text-only: Main.scala:20-24);
this extends the multimodal north-star requirement.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None
_lib_err: Exception | None = None


def _load():
    """Resolve and prototype libwebp once; cache the failure too so a
    PIL-less, libwebp-less environment fails fast with the cause."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        if _lib is None:
            raise ImportError(f"libwebp unavailable: {_lib_err}")
        return _lib
    try:
        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        lib = ctypes.CDLL(name)
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError as ex:  # loader failure == library absent
        _lib_err = ex
        raise ImportError(f"libwebp unavailable: {ex}") from ex
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def encode_rgb(arr: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode an (h, w, 3) uint8 array as lossy WebP ("VP8 " chunk)."""
    lib = _load()
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"need (h, w, 3) uint8, got {arr.dtype} {arr.shape}")
    h, w = arr.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(arr).tobytes(), w, h, w * 3,
        float(quality), ctypes.byref(out),
    )
    if n == 0 or not out.value:
        raise ValueError(f"libwebp encode failed for {w}x{h} at q={quality}")
    try:
        return ctypes.string_at(out.value, n)
    finally:
        lib.WebPFree(out)


def encode_rgba(arr: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode an (h, w, 4) uint8 array; non-opaque alpha makes libwebp
    emit a VP8X + ALPH container — the REAL-encoder fixture source for
    functions/webpx.py's conformance tests."""
    lib = _load()
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 4:
        raise ValueError(f"need (h, w, 4) uint8, got {arr.dtype} {arr.shape}")
    h, w = arr.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(
        np.ascontiguousarray(arr).tobytes(), w, h, w * 4,
        float(quality), ctypes.byref(out),
    )
    if n == 0 or not out.value:
        raise ValueError(f"libwebp RGBA encode failed for {w}x{h}")
    try:
        return ctypes.string_at(out.value, n)
    finally:
        lib.WebPFree(out)


def decode_rgb(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode any libwebp-supported WebP payload to (w, h, rgb array)."""
    lib = _load()
    wd, hd = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGB(data, len(data), ctypes.byref(wd), ctypes.byref(hd))
    if not p:
        raise ValueError("libwebp could not decode the payload")
    try:
        arr = np.ctypeslib.as_array(p, shape=(hd.value, wd.value, 3)).copy()
    finally:
        lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return wd.value, hd.value, arr


def decode_rgba(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode any libwebp-supported payload (incl. VP8X + ALPH) to
    (w, h, rgba array) — the alpha-channel oracle for functions/webpx.py."""
    lib = _load()
    wd, hd = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(wd), ctypes.byref(hd))
    if not p:
        raise ValueError("libwebp could not decode the payload to RGBA")
    try:
        arr = np.ctypeslib.as_array(p, shape=(hd.value, wd.value, 4)).copy()
    finally:
        lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return wd.value, hd.value, arr


def decode_yuv(data: bytes) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """Decode to the raw 4:2:0 planes — (w, h, y, u, v) with y shaped
    (h, w) and u/v ((h+1)//2, (w+1)//2). This is the spec-level output
    surface RFC 6386 defines; tests compare the pure-Python decoder
    against it BEFORE any color conversion, which the spec does not
    standardize."""
    lib = _load()
    wd, hd = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(wd), ctypes.byref(hd),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not yp:
        raise ValueError("libwebp could not decode the payload to YUV")
    try:
        w, h = wd.value, hd.value
        uw, uh = (w + 1) // 2, (h + 1) // 2
        y = np.ctypeslib.as_array(yp, shape=(h, stride.value))[:, :w].copy()
        u = np.ctypeslib.as_array(up, shape=(uh, uv_stride.value))[:, :uw].copy()
        v = np.ctypeslib.as_array(vp, shape=(uh, uv_stride.value))[:, :uw].copy()
    finally:
        lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return w, h, y, u, v
