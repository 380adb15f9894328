"""ctypes bindings for the native host pre/post-processing runtime.

Loads ``runtime/librerevst_host.so`` (built by ``make -C runtime``); builds
it on first use if a toolchain is available.  All entry points fall back to
the pure-numpy path (``rerevst_tpu.data.transforms`` +
``ops.image.pad_reflect_multiple``) when the library is absent, so the
framework stays usable without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "librerevst_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.rerevst_preprocess.argtypes = [u8p, i, i, f32p, i, i, i]
    lib.rerevst_postprocess.argtypes = [f32p, i, i, i, u8p, i, i]
    lib.rerevst_preprocess_batch.argtypes = [u8p, i, i, i, f32p, i, i, i]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess(frame_bgr: np.ndarray, out_h: int, out_w: int,
               pad: int) -> np.ndarray:
    """BGR u8 [H,W,3] -> normalized RGB f32 [1,out_h,out_w,3], reflect-padded.

    Fused native equivalent of bgr_to_model + pad_reflect_multiple.
    """
    lib = _load()
    if lib is None:
        from rerevst_tpu.data.transforms import bgr_to_model
        from rerevst_tpu.ops.image import pad_reflect_multiple

        x = bgr_to_model(frame_bgr)
        return np.asarray(pad_reflect_multiple(x, pad, 1, (out_h, out_w)))
    frame = np.ascontiguousarray(frame_bgr, dtype=np.uint8)
    h, w = frame.shape[:2]
    out = np.empty((1, out_h, out_w, 3), np.float32)
    lib.rerevst_preprocess(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w, pad)
    return out


def postprocess(x: np.ndarray, orig_h: int, orig_w: int,
                pad: int) -> np.ndarray:
    """Normalized RGB f32 [1,H,W,3] (padded) -> BGR u8 [orig_h,orig_w,3]."""
    lib = _load()
    if lib is None:
        from rerevst_tpu.data.transforms import model_to_bgr

        return model_to_bgr(
            x[:, pad : pad + orig_h, pad : pad + orig_w, :])
    xin = np.ascontiguousarray(x[0], dtype=np.float32)
    in_h, in_w = xin.shape[:2]
    out = np.empty((orig_h, orig_w, 3), np.uint8)
    lib.rerevst_postprocess(
        xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), in_h, in_w, pad,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), orig_h, orig_w)
    return out


def preprocess_batch(frames_bgr: np.ndarray, out_h: int, out_w: int,
                     pad: int) -> np.ndarray:
    """[N,H,W,3] u8 -> [N,out_h,out_w,3] f32 in one native call."""
    lib = _load()
    if lib is None:
        return np.concatenate(
            [preprocess(f, out_h, out_w, pad) for f in frames_bgr])
    frames = np.ascontiguousarray(frames_bgr, dtype=np.uint8)
    n, h, w = frames.shape[:3]
    out = np.empty((n, out_h, out_w, 3), np.float32)
    lib.rerevst_preprocess_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w, pad)
    return out
