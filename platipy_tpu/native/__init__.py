"""Native host fast paths (C++ via ctypes).

The shared library is built at install time (setup.py) or on demand with g++.
All callers fall back to the pure-JAX implementations when the library is
unavailable, so the native layer is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["get_lib", "available", "cc_label_3d", "edt_sq_3d", "region_grow_3d",
           "fill_holes_3d"]

_LIB = None
_TRIED = False


def _lib_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    here = Path(__file__).parent
    for cand in sorted(here.glob(f"_fastops*{suffix.split('.')[-1]}")):
        return cand
    return here / "_fastops.so"


def _build() -> Path:
    """Compile the library in place with g++ (one-time, ~seconds)."""
    src = Path(__file__).parent / "src" / "fastops.cpp"
    out = Path(__file__).parent / "_fastops.so"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)]
    logger.info("Building native fastops: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    try:
        if not path.exists():
            path = _build()
        lib = ctypes.CDLL(str(path))
        lib.cc_label_3d.restype = ctypes.c_int
        lib.cc_label_3d.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.edt_sq_3d.restype = None
        lib.edt_sq_3d.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_void_p,
        ]
        lib.region_grow_3d.restype = None
        lib.region_grow_3d.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.fill_holes_3d.restype = None
        lib.fill_holes_3d.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception as err:
        logger.info("Native fastops unavailable (%s); using JAX fallbacks", err)
        _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


def cc_label_3d(mask: np.ndarray, connectivity: int = 26) -> np.ndarray:
    lib = get_lib()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    labels = np.zeros(mask.shape, dtype=np.int32)
    nz, ny, nx = mask.shape
    lib.cc_label_3d(
        mask.ctypes.data, nz, ny, nx, connectivity, labels.ctypes.data
    )
    return labels


def edt_sq_3d(mask: np.ndarray, spacing_xyz=(1.0, 1.0, 1.0)) -> np.ndarray:
    lib = get_lib()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.zeros(mask.shape, dtype=np.float32)
    nz, ny, nx = mask.shape
    sx, sy, sz = (float(s) for s in spacing_xyz)
    lib.edt_sq_3d(mask.ctypes.data, nz, ny, nx, sx, sy, sz, out.ctypes.data)
    return out


def region_grow_3d(image: np.ndarray, seeds_zyx, lower: float, upper: float,
                   connectivity: int = 6) -> np.ndarray:
    lib = get_lib()
    image = np.ascontiguousarray(image.astype(np.float32))
    seeds = np.ascontiguousarray(np.asarray(seeds_zyx, dtype=np.int32).reshape(-1, 3))
    out = np.zeros(image.shape, dtype=np.uint8)
    nz, ny, nx = image.shape
    lib.region_grow_3d(
        image.ctypes.data, nz, ny, nx, seeds.ctypes.data, seeds.shape[0],
        float(lower), float(upper), connectivity, out.ctypes.data,
    )
    return out


def fill_holes_3d(mask: np.ndarray, connectivity: int = 6) -> np.ndarray:
    lib = get_lib()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.zeros(mask.shape, dtype=np.uint8)
    nz, ny, nx = mask.shape
    lib.fill_holes_3d(mask.ctypes.data, nz, ny, nx, connectivity, out.ctypes.data)
    return out
