"""Euclidean distance transform with nearest-site indices.

Semantics match ``scipy.ndimage.distance_transform_edt(input,
return_indices=True)`` as used by the reference mask-infill
(convex_adam_MIND.py:44,49): for every *nonzero* voxel of ``input``, the
index of the nearest zero voxel (zero voxels map to themselves).

A native C++ implementation (Felzenszwalb-Huttenlocher separable lower
envelope, convexadam_tpu/native) is used when built; scipy is the fallback.
"""

from __future__ import annotations

import numpy as np

_native = None


def _load_native():
    global _native
    if _native is None:
        try:
            from convexadam_tpu.native import edt as native_edt  # noqa: PLC0415

            _native = native_edt
        except Exception:
            _native = False
    return _native


def edt_nearest_indices(input_mask: np.ndarray) -> np.ndarray:
    """Return (3, H, W, D) indices of the nearest zero voxel for each voxel."""
    native = _load_native()
    if native:
        return native.nearest_indices(np.ascontiguousarray(input_mask, np.uint8))
    from scipy.ndimage import distance_transform_edt

    _, idx = distance_transform_edt(input_mask, return_indices=True)
    return idx


def edt_distance(input_mask: np.ndarray, sampling=None) -> np.ndarray:
    """Distance of each nonzero voxel to the nearest zero voxel."""
    native = _load_native()
    if native and sampling is None:
        return native.distance(np.ascontiguousarray(input_mask, np.uint8))
    from scipy.ndimage import distance_transform_edt

    return distance_transform_edt(input_mask, sampling=sampling)
