"""ctypes binding to the native C++ data pipeline (``native/dataloader.cpp``).

Builds ``native/libgicdata.so`` on first use (``make -C native``) and falls
back to the pure-Python path (PIL + numpy, :mod:`images`/:mod:`loader`) when
the toolchain or libjpeg is unavailable — all call sites gate on
:func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgicdata.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.gic_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        lib.gic_decode_image.restype = ctypes.c_int
        lib.gic_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int]
        lib.gic_decode_batch.restype = ctypes.c_int
        lib.gic_assemble_captions.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        lib.gic_decode_image_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
        lib.gic_decode_image_u8.restype = ctypes.c_int
        lib.gic_decode_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int]
        lib.gic_decode_batch_u8.restype = ctypes.c_int
        lib.gic_assemble_captions.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str, image_size: int) -> Optional[np.ndarray]:
    """JPEG → normalized CHW float32 (native).  None on decode failure."""
    lib = _load()
    out = np.empty((3, image_size, image_size), np.float32)
    if lib.gic_decode_image(path.encode(), image_size, out) != 0:
        return None
    return out


def decode_batch(paths: List[str], image_size: int,
                 num_threads: int = 4) -> np.ndarray:
    """Threaded batch decode → [N, 3, S, S] float32 (failed slots zeroed)."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, 3, image_size, image_size), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.gic_decode_batch(c_paths, n, image_size, out, num_threads)
    return out


def decode_image_u8(path: str, image_size: int) -> Optional[np.ndarray]:
    """JPEG → resized CHW uint8 (normalization deferred to the device)."""
    lib = _load()
    out = np.empty((3, image_size, image_size), np.uint8)
    if lib.gic_decode_image_u8(path.encode(), image_size, out) != 0:
        return None
    return out


def assemble_captions(token_lists: List[np.ndarray], seq_len: int):
    """Fixed-shape caption collate (native) → (captions, lengths, weights)."""
    lib = _load()
    n = len(token_lists)
    flat = (np.concatenate(token_lists).astype(np.int32)
            if token_lists else np.zeros((0,), np.int32))
    offsets = np.zeros((n + 1,), np.int64)
    np.cumsum([len(t) for t in token_lists], out=offsets[1:])
    captions = np.empty((n, seq_len), np.int32)
    lengths = np.empty((n,), np.int32)
    weights = np.empty((n,), np.float32)
    lib.gic_assemble_captions(np.ascontiguousarray(flat), offsets, n, seq_len,
                              captions, lengths, weights)
    return captions, lengths, weights
