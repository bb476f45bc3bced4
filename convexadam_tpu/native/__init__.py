"""Native (C++) host-side components, loaded via ctypes.

Built on first import with g++ (no pybind11 dependency); artifacts are
cached next to the sources.  Falls back silently — callers (utils/edt.py)
catch ImportError and use scipy.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "_edt.so"


def _build() -> Path:
    src = _HERE / "edt.cpp"
    if _SO.exists() and _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


_lib = ctypes.CDLL(str(_build()))
_lib.edt3d_nearest.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_float),
]
_lib.edt3d_nearest.restype = None


class edt:
    """Namespace mirroring utils/edt.py's native hooks."""

    @staticmethod
    def nearest_indices(mask: np.ndarray) -> np.ndarray:
        mask = np.ascontiguousarray(mask, np.uint8)
        H, W, D = mask.shape
        idx = np.empty((3, H, W, D), np.int32)
        _lib.edt3d_nearest(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            H, W, D,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            None,
        )
        return idx

    @staticmethod
    def distance(mask: np.ndarray) -> np.ndarray:
        mask = np.ascontiguousarray(mask, np.uint8)
        H, W, D = mask.shape
        idx = np.empty((3, H, W, D), np.int32)
        dist = np.empty((H, W, D), np.float32)
        _lib.edt3d_nearest(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            H, W, D,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return dist
