"""ctypes bindings for the native C++ grid-ops library.

The library mirrors the reference's CUDA kernel semantics on the host (see
gridops.cpp); it is auto-built with g++ on first import if the shared object
is missing. All functions accept/return contiguous numpy arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgridops.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.check_call(["sh", os.path.join(_DIR, "build.sh")])
    _lib = ctypes.CDLL(_SO)
    f32 = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_ubyte)
    i32, i64 = ctypes.c_int, ctypes.c_int64
    _lib.trilinear_sample.argtypes = [f32, i32, i32, i32, i32, f32, i64, f32]
    _lib.alpha2weight.argtypes = [f32, u8, i64, i32, f32, f32]
    _lib.tv_grad.argtypes = [f32, i32, i32, i32, i32, ctypes.c_float,
                             ctypes.c_float, ctypes.c_float, f32, f32]
    _lib.mask_lookup.argtypes = [u8, i32, i32, i32, f32, f32, f32, i64, u8]
    _lib.cumdist_thres.argtypes = [f32, i64, i32, ctypes.c_float, u8]
    _lib.adam_step.argtypes = [f32, f32, f32, f32, f32, i64, i32,
                               ctypes.c_float, ctypes.c_float, ctypes.c_float,
                               ctypes.c_float, i32]
    return _lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def trilinear_sample(grid: np.ndarray, ind01: np.ndarray) -> np.ndarray:
    lib = _load()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    ind01 = np.ascontiguousarray(ind01, dtype=np.float32).reshape(-1, 3)
    X, Y, Z, C = grid.shape
    out = np.empty((ind01.shape[0], C), dtype=np.float32)
    lib.trilinear_sample(_fp(grid), X, Y, Z, C, _fp(ind01), ind01.shape[0], _fp(out))
    return out


def alpha2weight(alpha: np.ndarray, valid: np.ndarray | None = None):
    lib = _load()
    alpha = np.ascontiguousarray(alpha, dtype=np.float32)
    N, K = alpha.shape
    weights = np.empty_like(alpha)
    ail = np.empty(N, dtype=np.float32)
    vptr = _up(np.ascontiguousarray(valid, dtype=np.uint8)) if valid is not None else None
    lib.alpha2weight(_fp(alpha), vptr, N, K, _fp(weights), _fp(ail))
    return weights, ail


def tv_grad(grid: np.ndarray, wx: float, wy: float, wz: float,
            sparse_grad: np.ndarray | None = None) -> np.ndarray:
    lib = _load()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    X, Y, Z, C = grid.shape
    out = np.empty_like(grid)
    sptr = _fp(np.ascontiguousarray(sparse_grad, dtype=np.float32)) if sparse_grad is not None else None
    lib.tv_grad(_fp(grid), X, Y, Z, C, wx, wy, wz, sptr, _fp(out))
    return out


def mask_lookup(mask: np.ndarray, xyz: np.ndarray, xyz_min, xyz_max) -> np.ndarray:
    lib = _load()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    xyz = np.ascontiguousarray(xyz, dtype=np.float32).reshape(-1, 3)
    mn = np.ascontiguousarray(xyz_min, dtype=np.float32)
    mx = np.ascontiguousarray(xyz_max, dtype=np.float32)
    out = np.empty(xyz.shape[0], dtype=np.uint8)
    lib.mask_lookup(_up(mask), *mask.shape, _fp(xyz), _fp(mn), _fp(mx),
                    xyz.shape[0], _up(out))
    return out.astype(bool)


def cumdist_thres(dist: np.ndarray, thres: float) -> np.ndarray:
    lib = _load()
    dist = np.ascontiguousarray(dist, dtype=np.float32)
    N, K = dist.shape
    out = np.empty((N, K), dtype=np.uint8)
    lib.cumdist_thres(_fp(dist), N, K, thres, _up(out))
    return out.astype(bool)


def adam_step(param, grad, m, v, *, step: int, lr: float, beta1=0.9, beta2=0.99,
              eps=1e-8, mode: int = 0, perlr=None):
    """In-place MaskedAdam step; mode 0=plain, 1=skip-zero-grad, 2=per-lr."""
    lib = _load()
    for a in (param, m, v):
        assert a.dtype == np.float32 and a.flags.c_contiguous
    grad = np.ascontiguousarray(grad, dtype=np.float32)
    pptr = _fp(np.ascontiguousarray(perlr, dtype=np.float32)) if perlr is not None else None
    lib.adam_step(_fp(param), _fp(grad), _fp(m), _fp(v), pptr, param.size,
                  step, beta1, beta2, lr, eps, mode)
