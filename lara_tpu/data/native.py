"""ctypes bindings for the native data-path kernels (native/lara_native.cpp).

Falls back to numpy implementations when the shared library has not been
built (`make -C native`). All entry points take/return numpy arrays with
the same semantics as the reference loader code they replace.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "liblara_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # first-use build (the .so is not checked in): one small TU, ~1 s
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            pass  # no toolchain → numpy fallbacks
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.composite_rgba.argtypes = [u8p, f32p, f32p, u8p, ctypes.c_int64]
        lib.decode_normal.argtypes = [u8p, f32p, f32p, ctypes.c_int64]
        lib.build_rays.argtypes = [f32p, f32p, ctypes.c_int32, ctypes.c_int32, f32p]
        _LIB = lib
    return _LIB


def have_native() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def composite_rgba(rgba: np.ndarray, bg: np.ndarray):
    """rgba u8 [H,W,4], bg f32 [3] → (rgb f32 [H,W,3], mask u8 [H,W])."""
    lib = _load()
    h, w = rgba.shape[:2]
    if lib is None:
        img = rgba.astype(np.float32) / 255.0
        rgb = (img[..., :3] * img[..., 3:]
               + bg.astype(np.float32) * (1 - img[..., 3:])).astype(np.float32)
        return rgb, (rgba[..., 3] > 0).astype(np.uint8)
    rgba = np.ascontiguousarray(rgba)
    bg = np.ascontiguousarray(bg, np.float32)
    rgb = np.empty((h, w, 3), np.float32)
    mask = np.empty((h, w), np.uint8)
    lib.composite_rgba(_up(rgba), _fp(bg), _fp(rgb), _up(mask), h * w)
    return rgb, mask


def decode_normal(nrm_u8: np.ndarray, rot: np.ndarray) -> np.ndarray:
    """u8 [H,W,3] → f32 [H,W,3] in [-1,1] rotated by rot^T (row-vectors)."""
    lib = _load()
    if lib is None:
        n = nrm_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
        return (n @ rot.T).astype(np.float32)
    nrm_u8 = np.ascontiguousarray(nrm_u8)
    rot = np.ascontiguousarray(rot, np.float32)
    out = np.empty(nrm_u8.shape, np.float32)
    lib.decode_normal(_up(nrm_u8), _fp(rot), _fp(out), nrm_u8.shape[0] * nrm_u8.shape[1])
    return out


def build_rays_single(c2w: np.ndarray, ixt: np.ndarray, H: int, W: int) -> np.ndarray:
    """One view's rays [H,W,6] (native or numpy fallback)."""
    lib = _load()
    if lib is None:
        from lara_tpu.utils.camera import build_rays_np
        return build_rays_np(c2w[None], ixt[None], H, W, 1.0)[0]
    ixt_inv = np.ascontiguousarray(np.linalg.inv(ixt), np.float32)
    c2w = np.ascontiguousarray(c2w, np.float32)
    out = np.empty((H, W, 6), np.float32)
    lib.build_rays(_fp(c2w), _fp(ixt_inv), H, W, _fp(out))
    return out
