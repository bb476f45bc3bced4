"""Warp application: apply a displacement field to a moving image.

Reference: apply_convex.py — ``apply_convex`` warps with
``scipy.ndimage.map_coordinates(order=1)`` at ``identity + disp``;
``apply_convex_original_moving`` first rescales the field into the original
moving image's space (no moving-image resample) and then warps.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.warp import identity_grid_voxels, map_coordinates_trilinear
from convexadam_tpu.geometry.displacement import rescale_displacement_field
from convexadam_tpu.geometry.image import MedicalImage


@jax.jit
def apply_convex_jax(disp: jax.Array, moving: jax.Array) -> jax.Array:
    """Warp ``moving`` (H, W, D) by ``disp`` (H, W, D, 3) (voxel units,
    array-order channels).  Matches apply_convex.py:13-24 (trilinear,
    constant-zero outside)."""
    coords = identity_grid_voxels(moving.shape, disp.dtype) + jnp.moveaxis(disp, -1, 0)
    return map_coordinates_trilinear(moving, coords, mode="constant")


def apply_convex(
    disp: Union[np.ndarray, MedicalImage],
    moving: Union[np.ndarray, MedicalImage],
) -> np.ndarray:
    """Host-level apply: numpy/MedicalImage in → numpy out."""
    if isinstance(disp, MedicalImage):
        disp = disp.data
    if isinstance(moving, MedicalImage):
        moving = moving.data
    out = apply_convex_jax(
        jnp.asarray(np.asarray(disp), jnp.float32),
        jnp.asarray(np.asarray(moving), jnp.float32),
    )
    return np.asarray(out)


def apply_convex_original_moving(
    disp: np.ndarray,
    moving_image_original: MedicalImage,
    fixed_image_original: MedicalImage,
    fixed_image_resampled: MedicalImage,
) -> MedicalImage:
    """Warp the *original* moving image (no resampling of the moving image):
    rescale the field into the moving image's space first
    (apply_convex.py:27-78)."""
    field = rescale_displacement_field(
        np.asarray(disp, np.float32),
        moving_image=moving_image_original,
        fixed_image=fixed_image_original,
        fixed_image_resampled=fixed_image_resampled,
    )
    warped = apply_convex(field, moving_image_original.data)
    out = MedicalImage(
        warped.astype(np.float32),
        moving_image_original.spacing,
        moving_image_original.origin,
        moving_image_original.direction,
    )
    return out
