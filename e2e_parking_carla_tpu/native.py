"""ctypes bindings for the native episode codec (native/episode_codec.cpp).

Loads `native/libepisode_codec.so` if present (build with `make -C native`);
every function has a numpy fallback so the framework works without the
build step. The native paths replace the reference's Python image plumbing
(10 PNG writer threads, data_generator.py:199-213; PIL decode+normalize in 8
dataloader workers, carla_dataset.py:494-515).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "native", "libepisode_codec.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.episode_codec_abi_version.restype = ctypes.c_int
    if lib.episode_codec_abi_version() != 1:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.depth_encode.argtypes = [f32p, u8p, ctypes.c_int64, ctypes.c_int]
    lib.depth_decode.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int]
    lib.bev_pack.argtypes = [u8p, u8p, ctypes.c_int64, ctypes.c_int]
    lib.bev_unpack.argtypes = [u8p, u8p, ctypes.c_int64, ctypes.c_int]
    lib.normalize_crop.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_THREADS = max(1, (os.cpu_count() or 4) - 1)


def depth_encode(depth_m: np.ndarray) -> np.ndarray:
    """(..., ) meters -> (..., 3) CARLA RGB depth encoding."""
    depth_m = np.ascontiguousarray(depth_m, np.float32)
    lib = _load()
    if lib is None:
        norm = np.clip(depth_m / 1000.0, 0.0, 1.0)
        code = np.round(norm.astype(np.float64) * (256 ** 3 - 1)).astype(np.int64)
        return np.stack([code % 256, (code // 256) % 256, code // 65536],
                        axis=-1).astype(np.uint8)
    out = np.empty((*depth_m.shape, 3), np.uint8)
    lib.depth_encode(depth_m, out, depth_m.size, _THREADS)
    return out


def depth_decode(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) CARLA RGB depth -> (...,) meters."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    lib = _load()
    if lib is None:
        d = rgb.astype(np.float64)
        norm = (d[..., 0] + d[..., 1] * 256.0 + d[..., 2] * 65536.0) / (256 ** 3 - 1)
        return (1000.0 * norm).astype(np.float32)
    out = np.empty(rgb.shape[:-1], np.float32)
    lib.depth_decode(rgb, out, out.size, _THREADS)
    return out


def bev_pack(bev: np.ndarray) -> np.ndarray:
    """(15, H, W) {0,1} -> (3, H, W) bit-packed (tools.py:9-24)."""
    assert bev.shape[0] == 15
    bev = np.ascontiguousarray(bev != 0, np.uint8)
    hw = bev.shape[1] * bev.shape[2]
    lib = _load()
    if lib is None:
        out = np.zeros((3, *bev.shape[1:]), np.uint8)
        for c in range(15):
            out[c // 5] |= bev[c] << (8 - (c % 5) - 1)
        return out
    out = np.empty((3, *bev.shape[1:]), np.uint8)
    lib.bev_pack(bev, out, hw, _THREADS)
    return out


def bev_unpack(packed: np.ndarray) -> np.ndarray:
    """(3, H, W) -> (15, H, W) {0,1}."""
    assert packed.shape[0] == 3
    packed = np.ascontiguousarray(packed, np.uint8)
    hw = packed.shape[1] * packed.shape[2]
    lib = _load()
    if lib is None:
        out = np.zeros((15, *packed.shape[1:]), np.uint8)
        for c in range(15):
            out[c] = (packed[c // 5] >> (8 - (c % 5) - 1)) & 1
        return out
    out = np.empty((15, *packed.shape[1:]), np.uint8)
    lib.bev_unpack(packed, out, hw, _THREADS)
    return out


def normalize_crop(rgb: np.ndarray, crop: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (crop, crop, 3) f32, center-cropped and
    ImageNet-normalized (carla_dataset.py:47-63,494-515)."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    lib = _load()
    if lib is None:
        y0, x0 = h // 2 - crop // 2, w // 2 - crop // 2
        img = rgb[y0:y0 + crop, x0:x0 + crop].astype(np.float32) / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (img - mean) / std
    out = np.empty((crop, crop, 3), np.float32)
    lib.normalize_crop(rgb, out, h, w, crop, _THREADS)
    return out
