"""Shared builder for CuRIOUS cases on the REAL landmark geometry.

The reference snapshot ships the actual CuRIOUS landmark volumes
(l2r_2020_curious_landmarks.zip) but not the EASY-RESECT MRI/US images, so
the fixture reconstructs the landmark volumes exactly (sparse voxel lists in
tests/curious_landmarks.npz, see tests/regen_curious_fixture.py) and
synthesizes T1/FLAIR/US images around them: a TPS field interpolating the
REAL MRI<->US landmark correspondences is the ground-truth deformation, the
"US" is the warped anatomy under a nonlinear contrast remap restricted to a
field-of-view around the landmark cloud (real US volumes are masked the same
way — the reference gates its cost volumes on ``img > 10``,
l2r_2020_convexAdam_CuRIOUS.py:330-336).

So the registration problem solved in tests carries the real clinical
brain-shift displacement field (Case1 mean 4.3 / max 8.9 voxels) even though
the image texture is synthetic.
"""

import pathlib

import numpy as np
from scipy.ndimage import uniform_filter

_NPZ = pathlib.Path(__file__).parent / "curious_landmarks.npz"


def build_case(case: int = 1, margin: int = 24, seed: int = 0) -> dict:
    """Crop-space CuRIOUS case around the real landmark cloud of ``case``.

    Returns dict with images (us, t1, flair), landmark volumes
    (seg_us, seg_mri), the crop origin, and the true initial TRE
    (from the full-resolution real centroids)."""
    z = np.load(_NPZ)
    cu = z[f"coords_US_{case}"].astype(np.int64)
    lu = z[f"labels_US_{case}"]
    cm = z[f"coords_MRI_{case}"].astype(np.int64)
    lm = z[f"labels_MRI_{case}"]
    cen_u = z[f"centroids_US_{case}"]
    cen_m = z[f"centroids_MRI_{case}"]
    full = z["shape"]

    lo = np.maximum(np.minimum(cu.min(0), cm.min(0)) - margin, 0)
    hi = np.minimum(np.maximum(cu.max(0), cm.max(0)) + margin + 1, full)
    shape = tuple(int(-(-(h - l) // 8) * 8) for l, h in zip(lo, hi))
    hi = lo + np.array(shape)
    assert (hi <= full).all(), "crop exceeds volume; reduce margin"

    seg_us = np.zeros(shape, np.int32)
    seg_mri = np.zeros(shape, np.int32)
    pu = cu - lo
    pm = cm - lo
    seg_us[pu[:, 0], pu[:, 1], pu[:, 2]] = lu
    seg_mri[pm[:, 0], pm[:, 1], pm[:, 2]] = lm

    # ground-truth deformation: TPS interpolating the real correspondences
    # (fixed US space -> moving MRI space), in crop coordinates
    import jax.numpy as jnp

    from convexadam_tpu.core.rigid import thin_plate_dense

    half = (np.array(shape, np.float32) - 1.0) / 2.0
    ctrl = (cen_u - lo) / half - 1.0
    vals = (cen_m - cen_u) / half
    disp_gt = np.asarray(
        thin_plate_dense(
            jnp.asarray(ctrl, jnp.float32), jnp.asarray(vals, jnp.float32),
            shape, step=4,
        )
    ) * half  # (H, W, D, 3) voxel displacements, array order

    # synthetic anatomy: smooth multi-scale blobs, strictly positive
    rng = np.random.default_rng(seed)
    a = uniform_filter(rng.standard_normal(shape).astype(np.float32), 5)
    a = a + 0.5 * uniform_filter(
        rng.standard_normal(shape).astype(np.float32), 11
    )
    a = (a - a.min()) / (a.max() - a.min())
    t1 = 30.0 + 200.0 * a
    flair = 30.0 + 200.0 * (1.0 - a) ** 1.5  # different contrast, same anatomy

    from convexadam_tpu.core.warp import warp_with_displacement

    us_raw = np.asarray(
        warp_with_displacement(
            jnp.asarray(t1, jnp.float32)[None],
            jnp.moveaxis(jnp.asarray(disp_gt, jnp.float32), -1, 0),
        )[0]
    )
    # nonlinear (monotone) contrast remap = a different "modality"
    us = 15.0 + 12.0 * np.sqrt(np.maximum(us_raw - 25.0, 0.0))
    # US field of view: a box around the US landmark cloud (outside -> 0,
    # below the reference's >10 mask threshold)
    fov_lo = np.maximum((cen_u.min(0) - lo - 16).astype(int), 0)
    fov_hi = np.minimum((cen_u.max(0) - lo + 17).astype(int), shape)
    fov = np.zeros(shape, bool)
    fov[fov_lo[0]:fov_hi[0], fov_lo[1]:fov_hi[1], fov_lo[2]:fov_hi[2]] = True
    us = np.where(fov, us, 0.0).astype(np.float32)

    tre0_true = np.sqrt(((cen_u - cen_m) ** 2).sum(1))
    return dict(
        us=us, t1=t1.astype(np.float32), flair=flair.astype(np.float32),
        seg_us=seg_us, seg_mri=seg_mri, origin=lo, shape=shape,
        disp_gt=disp_gt, tre0_true=tre0_true,
        num_landmarks=int(max(lu.max(), lm.max())),
    )
