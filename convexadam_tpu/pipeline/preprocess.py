"""Host-side preprocessing: mask-aware image infill.

Reference: the ``use_mask`` branch of ``extract_features``
(src/convexAdam/convex_adam_MIND.py:36-51): dilate the mask with a
replicate-padded 3^3 box filter (> 0.9), compute nearest-inside-voxel indices
at half resolution with a Euclidean distance transform, gather, upsample
trilinearly (x2, align_corners=False), and paste the original values back
inside the mask.  The EDT is inherently host-side in the reference too
(scipy on CPU, convex_adam_MIND.py:44,49); we keep it on host (scipy, with a
native C++ EDT drop-in when built) and jit the rest.
"""

from __future__ import annotations

import numpy as np

from convexadam_tpu.utils.edt import edt_nearest_indices


def mask_infill(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Fill voxels outside ``mask`` with their nearest inside-mask value
    (computed at half resolution), keeping original values inside."""
    import jax.numpy as jnp

    from convexadam_tpu.core.smoothing import avg_pool3d_replicate
    from convexadam_tpu.core.warp import resize_trilinear

    H, W, D = img.shape
    mask_d = np.asarray(
        avg_pool3d_replicate(jnp.asarray(mask, jnp.float32)[None], 3)[0]
    )
    mask_d = (mask_d > 0.9).astype(np.float32)

    # half-resolution nearest-inside indices via EDT of the outside region
    outside_half = mask_d[::2, ::2, ::2] == 0
    idx = edt_nearest_indices(outside_half)  # (3, ceil(H/2), ...) int
    img_half = img[::2, ::2, ::2]
    h2, w2, d2 = img_half.shape  # ceil(S/2) per axis — the strides below
    # must use THESE (odd dims: floor(S/2) strides would gather misaligned
    # voxels, and the x2 upsample overshoots by one — crop back to S)
    lin = (idx[0].astype(np.int64) * d2 * w2
           + idx[1].astype(np.int64) * d2
           + idx[2].astype(np.int64))
    gathered = img_half.reshape(-1)[lin.reshape(-1)].reshape(h2, w2, d2)

    filled = np.asarray(
        resize_trilinear(
            jnp.asarray(gathered, jnp.float32)[None],
            (2 * h2, 2 * w2, 2 * d2),
            align_corners=False,
        )[0]
    )[:H, :W, :D]
    inside = mask_d != 0
    return np.where(inside, img, filled).astype(np.float32)
