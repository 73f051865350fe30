"""ctypes bindings for the native data-prep library (native/fast_prep.cpp).

Auto-builds with `make` on first use when a toolchain is available; every
entry point has a pure-numpy fallback so the framework runs without the
native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

# Installed wheels ship the prebuilt library inside the package
# (e4s2024_tpu/_native/); source checkouts build into native/ via make.
_PKG_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "_native", "libfast_prep.so")
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfast_prep.so")
_lib = None


def _find_lib():
    if os.path.exists(_PKG_LIB_PATH):
        return _PKG_LIB_PATH
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    if os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
        if os.path.exists(_LIB_PATH):
            return _LIB_PATH
    return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib()
    if path is None:
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(path)
        lib.prep_images_pm1.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int]
        lib.labels_to_onehot.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.hflip_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


def images_to_pm1(imgs_u8: np.ndarray, threads: int = 8) -> np.ndarray:
    """uint8 (...,) -> float32 [-1, 1]."""
    lib = _load()
    imgs_u8 = np.ascontiguousarray(imgs_u8, dtype=np.uint8)
    if not lib:
        return imgs_u8.astype(np.float32) / 127.5 - 1.0
    out = np.empty(imgs_u8.shape, np.float32)
    lib.prep_images_pm1(
        imgs_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        imgs_u8.size, threads)
    return out


def labels_to_onehot(labels_u8: np.ndarray, out_size: int,
                     num_classes: int = 12, threads: int = 8) -> np.ndarray:
    """(B, H, W) uint8 -> (B, S, S, K) float32 one-hot with nearest resize."""
    lib = _load()
    labels_u8 = np.ascontiguousarray(labels_u8, dtype=np.uint8)
    b, h, w = labels_u8.shape
    if not lib:
        ih = (np.arange(out_size) * h) // out_size
        iw = (np.arange(out_size) * w) // out_size
        small = labels_u8[:, ih][:, :, iw]
        return np.eye(num_classes, dtype=np.float32)[
            np.clip(small, 0, num_classes - 1)] * (small < num_classes)[..., None]
    out = np.empty((b, out_size, out_size, num_classes), np.float32)
    lib.labels_to_onehot(
        labels_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, out_size, num_classes, threads)
    return out


def hflip(img_u8: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 horizontal flip."""
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if not lib:
        return img_u8[:, ::-1].copy()
    h, w, c = img_u8.shape
    out = np.empty_like(img_u8)
    lib.hflip_u8(img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c)
    return out
