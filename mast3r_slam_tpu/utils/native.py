"""ctypes bindings for the native preprocessing library (native/preprocess.cpp).

Loads ``native/libpreprocess.so`` if built (``make -C native``); callers use
:func:`available` to decide between the native path and the PIL fallback in
``utils.image.resize_img``.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = pathlib.Path(__file__).resolve()
    for base in [here.parents[2], pathlib.Path.cwd()]:
        cand = base / "native" / "libpreprocess.so"
        if cand.exists():
            return str(cand)
    env = os.environ.get("MAST3R_SLAM_TPU_NATIVE")
    if env and os.path.exists(env):
        return env
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.preprocess_frame.restype = ctypes.c_int
    lib.preprocess_frame.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.remap_bilinear.restype = ctypes.c_int
    lib.remap_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def resize_img_native(img01: np.ndarray, size: int = 512):
    """Native equivalent of utils.image.resize_img (512 path).

    img01: float (H, W, 3) in [0, 1].  Returns the same dict structure.
    """
    lib = _load()
    assert lib is not None, "native library not built (make -C native)"
    assert size == 512
    H, W = img01.shape[:2]
    rgb = np.ascontiguousarray(np.clip(img01 * 255.0, 0, 255).astype(np.uint8))
    scale = size / max(H, W)
    outH, outW = int(round(H * scale)), int(round(W * scale))
    # crop rule matches resize_img: half sizes rounded to /16 grid
    cx, cy = outW // 2, outH // 2
    halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
    if outW == outH:
        halfh = int(3 * halfw / 4)
    cropW, cropH = 2 * halfw, 2 * halfh

    out_chw = np.empty((3, cropH, cropW), dtype=np.float32)
    out_rgb = np.empty((cropH, cropW, 3), dtype=np.uint8)
    rc = lib.preprocess_frame(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        outH, outW, cropH, cropW,
        out_chw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert rc == 0, f"preprocess_frame failed: {rc}"
    return dict(
        img=out_chw,
        true_shape=np.int32([[cropH, cropW]]),
        unnormalized_img=out_rgb,
    )


def remap_native(rgb_u8: np.ndarray, mapx: np.ndarray, mapy: np.ndarray):
    """Native cv2.remap-equivalent bilinear undistortion."""
    lib = _load()
    assert lib is not None
    H, W = rgb_u8.shape[:2]
    rgb = np.ascontiguousarray(rgb_u8)
    mx = np.ascontiguousarray(mapx, dtype=np.float32)
    my = np.ascontiguousarray(mapy, dtype=np.float32)
    out = np.empty_like(rgb)
    rc = lib.remap_bilinear(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        mx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        my.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert rc == 0
    return out
