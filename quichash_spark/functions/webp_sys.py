"""ctypes binding to a system ``libwebp``, when one exists.

Two roles:

- **Conformance oracle** for the from-spec VP8L decoder
  (:mod:`~.vp8l`): ``tests/test_vp8l.py`` decodes libwebp-ENCODED
  lossless streams (which use the predictor/color transforms and the 2D
  LZ77 distance map heavily) with both implementations and requires
  bit-equality — the independent cross-check the module's round-4
  docstring said this environment lacked.
- **Decode tier for lossy VP8** in the multimodal registry
  (:func:`quichash_spark.functions.multimodal` wires
  :func:`decode_webp_auto`): the pure decoder stays the default for
  VP8L; payloads it cannot decode (lossy VP8 needs a full intra-frame
  DSP decoder, out of scope per SURVEY) fall through to the system
  library when present, else keep raising ``NotImplementedError`` into
  the kernel's ``decode_ok=false`` path.

API per the public libwebp headers (``webp/decode.h`` /
``webp/encode.h``): ``WebPDecodeRGBA``, ``WebPGetInfo``,
``WebPEncodeLosslessRGBA``, ``WebPFree``.  Load failure of any kind
degrades to ``available() -> None``.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_U8P = ctypes.POINTER(ctypes.c_uint8)
_lib: "ctypes.CDLL | None" = None
_tried = False


def available() -> "ctypes.CDLL | None":
    """The bound system libwebp, or None.  Tried at most once."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for name in (ctypes.util.find_library("webp"), "libwebp.so.7",
                 "libwebp.so"):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGBA.restype = _U8P
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(_U8P),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _lib = lib
            return _lib
        except (OSError, AttributeError):
            continue
    return None


def decode_rgba(data: bytes) -> np.ndarray:
    """WebP bytes (lossy or lossless) -> (h, w, 4) uint8 RGBA."""
    lib = available()
    if lib is None:
        raise RuntimeError("no system libwebp")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp: decode failed")
    try:
        n = h.value * w.value * 4
        out = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(
            h.value, w.value, 4
        ).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return out


def encode_lossless_rgba(img: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> lossless WebP bytes (test-oracle input
    generator; libwebp's encoder freely uses every VP8L feature)."""
    lib = available()
    if lib is None:
        raise RuntimeError("no system libwebp")
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 3:
        img = np.dstack([img, np.full((h, w), 255, np.uint8)])
    out = _U8P()
    n = lib.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(img).tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    if not n:
        raise ValueError("libwebp: encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
