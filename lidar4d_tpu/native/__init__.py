"""Native (C++) host-side preprocessing kernels, loaded via ctypes.

Compiled on first use with g++ (see build()); callers fall back to the pure
numpy/scipy implementations when the toolchain is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB = os.path.join(_HERE, "libpreprocess.so")
_lib = None
_load_failed = False


def build(force=False):
    """Compile the extension (g++ -O3). Returns the library path."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
    return _LIB


def _get():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        lib = ctypes.CDLL(build())
    except (OSError, subprocess.CalledProcessError):
        _load_failed = True
        return None
    c_i64 = ctypes.c_int64
    c_f64 = ctypes.c_double
    lib.lidar_to_pano.argtypes = [
        ctypes.POINTER(ctypes.c_float), c_i64, c_i64, c_i64,
        c_f64, c_f64, c_f64,
        ctypes.POINTER(c_f64), ctypes.POINTER(c_f64),
    ]
    lib.knn_outlier_mask.argtypes = [
        ctypes.POINTER(ctypes.c_float), c_i64, c_i64, c_f64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available():
    return _get() is not None


def lidar_to_pano_native(points_with_intensities, H, W, fov_up, fov,
                         max_depth=80.0):
    """Native twin of ops.pano.lidar_to_pano_with_intensities."""
    lib = _get()
    assert lib is not None
    pts = np.ascontiguousarray(points_with_intensities, np.float32)
    pano = np.zeros((H, W), np.float64)
    intens = np.zeros((H, W), np.float64)
    lib.lidar_to_pano(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], H, W, float(fov_up), float(fov), float(max_depth),
        pano.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        intens.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return pano, intens


def knn_outlier_mask_native(points, nb_neighbors=64, std_ratio=3.0):
    """Native twin of utils.pointcloud.statistical_outlier_removal's mask."""
    lib = _get()
    assert lib is not None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    mask = np.zeros((pts.shape[0],), np.uint8)
    lib.knn_outlier_mask(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], int(nb_neighbors), float(std_ratio),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)
